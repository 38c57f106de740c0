"""orc_ray — a Ray-Data-native per-column lightweight-compression engine.

From-scratch reimplementation of the query/data-processing capabilities of
the reference (olegz/orc, i.e. Apache ORC: per-column dictionary, RLEv2-style
integer encodings, frame-of-reference + bit-packing) plus FSST string
compression, expressed as streaming ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches.  See SURVEY.md for the structural analysis of the
reference this design derives from.

Layout:
  codecs/    pure numpy/arrow kernels (no Ray): bitpack, int block codec,
             dictionary, FSST, zstd block framing
  chunk.py   self-describing encoded-chunk format + per-column codec
             auto-selection (the analog of ORC's stripe + WriterImpl
             encoder selection, c++/src/ColumnWriter.cc)
  pipeline/  Ray Data encode/decode pipelines (map_batches actor pools,
             manifest-committed resumable output)
  state/     lineage manifest (the analog of ORC's footer-commits-the-file
             invariant at partition granularity)
"""

from . import _mem  # noqa: F401  (allocator tuning; see _mem.py)

__version__ = "0.1.0"
