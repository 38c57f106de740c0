"""Kill+resume demonstration (F6): SIGKILL an encode mid-run, resume, verify."""
import os, sys, time, signal, subprocess, json, shutil
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")

src = "/tmp/orc_ray_bench/f1-8000000-32"
out = "/tmp/kill_resume_store"
ref = "/tmp/kill_resume_ref"

child_code = f'''
import sys, os
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, log_to_driver=False)
from orc_ray.pipeline.encode import encode_dataset
encode_dataset("{src}", "{out}", batch_size=16384, resume=True)
ray.shutdown()
'''

shutil.rmtree(out, ignore_errors=True)
# 1. start encode, SIGKILL the whole process group mid-run
p = subprocess.Popen([sys.executable, "-c", child_code], start_new_session=True)
time.sleep(10)  # partway through (full run ~20-30 s at 16 cpus cold)
os.killpg(os.getpgid(p.pid), signal.SIGKILL)
p.wait()
time.sleep(2)
from orc_ray.state import manifest as mstate
committed_mid = mstate.load_committed(out)
n_chunks_mid = len(os.listdir(mstate.chunk_dir(out))) if os.path.exists(mstate.chunk_dir(out)) else 0
print(f"after kill: committed_files={len(committed_mid['files'])} chunks_on_disk={n_chunks_mid}", flush=True)

# 2. resume to completion
r = subprocess.run([sys.executable, "-c", child_code])
assert r.returncode == 0
rec = mstate.load_committed(out)
print("after resume:", json.dumps(rec["totals"]), flush=True)
assert rec["totals"]["rows"] == 8_000_000, rec["totals"]

# 3. compare chunk set against an uninterrupted run
shutil.rmtree(ref, ignore_errors=True)
child_ref = child_code.replace(f'"{out}"', f'"{ref}"')
subprocess.run([sys.executable, "-c", child_ref], check=True)
a = sorted(os.listdir(mstate.chunk_dir(out)))
b = sorted(os.listdir(mstate.chunk_dir(ref)))
print(f"chunk sets: resumed={len(a)} uninterrupted={len(b)} identical={a == b}", flush=True)
