"""Probe the bundled Apache ORC C++ 2.0.0 writer (the compiled reference
implementation) by parsing ORC file postscript/footer/stripe-footer protobufs
directly. Uncompressed files only -> raw protobuf bytes."""
import pyarrow as pa, pyarrow.orc as po, io, sys

STREAM_KINDS = {0:'PRESENT',1:'DATA',2:'LENGTH',3:'DICTIONARY_DATA',4:'DICTIONARY_COUNT',
                5:'SECONDARY',6:'ROW_INDEX',7:'BLOOM_FILTER',8:'BLOOM_FILTER_UTF8'}
ENC_KINDS = {0:'DIRECT',1:'DICTIONARY',2:'DIRECT_V2',3:'DICTIONARY_V2'}
TYPE_KINDS = {0:'BOOLEAN',1:'BYTE',2:'SHORT',3:'INT',4:'LONG',5:'FLOAT',6:'DOUBLE',7:'STRING',
              8:'BINARY',9:'TIMESTAMP',10:'LIST',11:'MAP',12:'STRUCT',13:'UNION',14:'DECIMAL',
              15:'DATE',16:'VARCHAR',17:'CHAR',18:'TIMESTAMP_INSTANT'}

def varint(b, i):
    r = 0; s = 0
    while True:
        x = b[i]; i += 1
        r |= (x & 0x7f) << s
        if not x & 0x80: return r, i
        s += 7

def fields(b):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    while i < len(b):
        key, i = varint(b, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = varint(b, i)
        elif wt == 2:
            ln, i = varint(b, i); v = b[i:i+ln]; i += ln
        elif wt == 5:
            v = b[i:i+4]; i += 4
        elif wt == 1:
            v = b[i:i+8]; i += 8
        else:
            raise ValueError(f'wire type {wt}')
        yield fn, wt, v

def parse(buf):
    pslen = buf[-1]
    ps = dict()
    for fn, wt, v in fields(buf[-1-pslen:-1]):
        ps.setdefault(fn, []).append(v)
    footer_len = ps[1][0]
    compression = ps.get(2, [0])[0]
    assert compression == 0, 'probe requires uncompressed'
    fb = buf[-1-pslen-footer_len:-1-pslen]
    stripes, types = [], []
    for fn, wt, v in fields(fb):
        if fn == 3:
            st = {}
            for f2, w2, v2 in fields(v): st[f2] = v2
            stripes.append(st)  # 1 offset 2 indexLength 3 dataLength 4 footerLength 5 rows
        elif fn == 4:
            t = {'kind': 0, 'sub': [], 'names': []}
            for f2, w2, v2 in fields(v):
                if f2 == 1: t['kind'] = v2
                elif f2 == 2:
                    if w2 == 0: t['sub'].append(v2)
                    else:
                        i = 0
                        while i < len(v2):
                            x, i = varint(v2, i); t['sub'].append(x)
                elif f2 == 3: t['names'].append(v2.decode())
            types.append(t)
    out = {'types': types, 'stripes': []}
    for st in stripes:
        off, ilen, dlen, flen = st.get(1,0), st.get(2,0), st.get(3,0), st[4]
        sfb = buf[off+ilen+dlen: off+ilen+dlen+flen]
        streams, encodings = [], []
        for fn, wt, v in fields(sfb):
            if fn == 1:
                s = {}
                for f2, w2, v2 in fields(v): s[f2] = v2
                streams.append((STREAM_KINDS.get(s.get(1,0)), s.get(2,0), s.get(3,0)))
            elif fn == 2:
                e = {}
                for f2, w2, v2 in fields(v): e[f2] = v2
                encodings.append((ENC_KINDS.get(e.get(1,0)), e.get(2,0)))
        out['stripes'].append({'rows': st.get(5,0), 'streams': streams, 'encodings': encodings,
                               'offset': off, 'indexLength': ilen, 'dataLength': dlen})
    return out

def data_stream_bytes(buf, parsed, col, kind='DATA', stripe=0):
    """Return raw bytes of a given stream in a stripe (uncompressed file)."""
    st = parsed['stripes'][stripe]
    pos = st['offset']
    # index streams come first, in stream order (ROW_INDEX/BLOOM), then data streams
    for k, c, ln in st['streams']:
        if k == kind and c == col:
            return buf[pos:pos+ln]
        pos += ln
    return None

def describe(table, name, **opts):
    sink = io.BytesIO()
    po.write_table(table, sink, compression='uncompressed', **opts)
    buf = sink.getvalue()
    p = parse(buf)
    print(f'--- {name}  ({len(buf)} bytes, opts={opts})')
    print('  types:', [(i, TYPE_KINDS.get(t["kind"]), t["names"]) for i, t in enumerate(p['types'])])
    for si, st in enumerate(p['stripes']):
        print(f'  stripe {si}: rows={st["rows"]}')
        print('    encodings:', [(i,)+e for i, e in enumerate(st['encodings'])])
        print('    streams:', [(k, c, ln) for k, c, ln in st['streams'] if k not in ('ROW_INDEX',)])
    return buf, p

def rle_subencodings(stream):
    """Walk RLEv2 runs in a DATA stream, return list of (subencoding, headerbyte)."""
    # Only safe for simple cases; we just report the first few run headers' top 2 bits.
    subs = []
    i = 0
    names = {0:'SHORT_REPEAT',1:'DIRECT',2:'PATCHED_BASE',3:'DELTA'}
    # We cannot fully walk without bit-unpacking; report first header only.
    if stream: subs.append(names[stream[0] >> 6])
    return subs
