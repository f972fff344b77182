"""Generate + cache the round-3 big-N SPD benchmark system.

N=57344 = 56*1024 (no padding at tb=512): the largest reference-law
system whose PACKED df64 pair (n*(n+tb)*4 B = 13.3 GB) fits one v5e's
16 GB HBM — the measured-frontier push of VERDICT.md round-3 item 2.
Uses bench.py's cache convention so later runs (and bench.py itself via
LAM_BENCH_SIZES) find it.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("LAM_BIG_N", 57344))
SEED = 2024
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "io", "bench", f"lam_bench_spd_N{N}_s{SEED}.npy")
if os.path.exists(path):
    print("already cached:", path)
    sys.exit(0)

from lam_tpu import generate as gen

t0 = time.time()
a = gen.random_spd_matrix_fast(N, seed=SEED)
print(f"generated in {time.time()-t0:.0f}s", flush=True)
tmp = path + ".tmp"
os.makedirs(os.path.dirname(path), exist_ok=True)
with open(tmp, "wb") as fh:
    np.save(fh, a)
os.replace(tmp, path)
print(f"saved {path} in {time.time()-t0:.0f}s total")
