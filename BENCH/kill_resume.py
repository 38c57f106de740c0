"""Kill+resume demonstration (F6): SIGKILL an encode mid-run, resume, verify.

``--encrypted`` runs the same protocol against a store with an AES-CTR
encrypted column (doc_id under a local master key): resumability and
durable manifest parts must hold identically for encrypted chunks, and
the resumed store's KEYED decode must recover the exact plaintext."""
import os, sys, time, signal, subprocess, json, shutil
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")

ENCRYPTED = "--encrypted" in sys.argv
URL = "--url" in sys.argv  # run the whole protocol over file:// URLs
# (every store byte through state/storage's fsspec dispatch, the
# non-os.path namespace an object store would use)
src = "/tmp/orc_ray_bench/f1-8000000-32"
tag = ("_enc" if ENCRYPTED else "") + ("_url" if URL else "")
out_dir = f"/tmp/kill_resume_store{tag}"
ref_dir = f"/tmp/kill_resume_ref{tag}"
out = ("file://" + out_dir) if URL else out_dir
ref = ("file://" + ref_dir) if URL else ref_dir

opts_code = (
    '''
import hashlib
from orc_ray.chunk import EncodeOptions
KEY = hashlib.sha256(b"kill-resume-demo-key").digest()
opts = EncodeOptions(encrypt={"doc_id": "k"}, encryption_keys={"k": KEY})
'''
    if ENCRYPTED
    else '''
from orc_ray.chunk import EncodeOptions
opts = EncodeOptions()
'''
)

child_code = f'''
import sys, os
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, log_to_driver=False)
from orc_ray.pipeline.encode import encode_dataset
{opts_code}
encode_dataset("{src}", "{out}", opts, batch_size=16384, resume=True)
ray.shutdown()
'''

shutil.rmtree(out_dir, ignore_errors=True)
# 1. start encode, SIGKILL the whole process group mid-run
p = subprocess.Popen([sys.executable, "-c", child_code], start_new_session=True)
time.sleep(10)  # partway through (full run ~20-30 s at 16 cpus cold)
os.killpg(os.getpgid(p.pid), signal.SIGKILL)
p.wait()
time.sleep(2)
from orc_ray.state import manifest as mstate
committed_mid = mstate.load_committed(out)
n_chunks_mid = len(os.listdir(mstate.chunk_dir(out_dir))) if os.path.exists(mstate.chunk_dir(out_dir)) else 0
print(f"after kill: committed_files={len(committed_mid['files'])} chunks_on_disk={n_chunks_mid}", flush=True)

# 2. resume to completion
r = subprocess.run([sys.executable, "-c", child_code])
assert r.returncode == 0
rec = mstate.load_committed(out)
print("after resume:", json.dumps(rec["totals"]), flush=True)
assert rec["totals"]["rows"] == 8_000_000, rec["totals"]

# 3. compare chunk set against an uninterrupted run
shutil.rmtree(ref_dir, ignore_errors=True)
child_ref = child_code.replace(f'"{out}"', f'"{ref}"')
subprocess.run([sys.executable, "-c", child_ref], check=True)
a = sorted(os.listdir(mstate.chunk_dir(out_dir)))
b = sorted(os.listdir(mstate.chunk_dir(ref_dir)))
print(f"chunk sets: resumed={len(a)} uninterrupted={len(b)} identical={a == b}", flush=True)

if ENCRYPTED:
    # 4. the resumed encrypted store must decode EXACTLY with the key
    # (plaintext doc_ids) and be fully masked without it
    check = f'''
import sys, os, hashlib
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import ray, pyarrow as pa, pyarrow.compute as pc
ray.init(address="local", num_cpus=16, include_dashboard=False, log_to_driver=False)
from orc_ray.pipeline.decode import decode_dataset
KEY = hashlib.sha256(b"kill-resume-demo-key").digest()
n = nn = 0
h = hashlib.sha256()
for t in decode_dataset("{out}", columns=["doc_id"], keys={{"k": KEY}}).iter_batches(batch_format="pyarrow", batch_size=None):
    c = t.column("doc_id").combine_chunks()
    n += len(c); nn += c.null_count
    h.update(hashlib.sha256(str(pc.min_max(c)).encode()).digest())
assert n == 8_000_000 and nn == 0, (n, nn)
masked = 0
for t in decode_dataset("{out}", columns=["doc_id"]).iter_batches(batch_format="pyarrow", batch_size=None):
    masked += t.column("doc_id").combine_chunks().null_count
print("keyed decode rows:", n, "nulls:", nn, "| keyless masked nulls:", masked, flush=True)
assert masked == 8_000_000, masked
ray.shutdown()
'''
    subprocess.run([sys.executable, "-c", check], check=True)
    print("encrypted kill+resume: keyed read exact, keyless read fully masked", flush=True)
