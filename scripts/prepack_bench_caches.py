"""Prebuild the on-disk fq pack caches for bench.py's system files.

bench.py's irfq legs call `DenseOperator.from_file_fq(path,
pack_cache=True)`; on a cache miss that pays the single-core
quantization pass INSIDE the driver's bench window (~18 min at
N=40000, ~55 min at N=70000 on this 1-core host). The pack is pure
host work (native/lam_native.cpp `ln_pack_fq`), so this script runs it
ahead of time — same source order as
`DenseOperator._from_file_packed` (solver/operators.py), same
publish contract (solver/pack_cache.py), no device involved.

Run after scripts/gen_bench_caches.py:

    python scripts/prepack_bench_caches.py &

Sizes via LAM_GEN_SIZES (comma list; default = bench.py's defaults).
Skips sizes whose cache already validates against the source file.
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SEED = 2024
SIZES = tuple(int(s) for s in os.environ.get(
    "LAM_GEN_SIZES", "10000,20000,40000,70000").split(","))
STORAGE = "fq"


def prepack(path):
    from lam_tpu import _native_io
    from lam_tpu.ops.gemv import SYMM_TB
    from lam_tpu.solver import pack_cache as pc
    from lam_tpu.solver.operators import (DenseOperator,
                                          _open_matrix_memmap,
                                          padded_size)

    src_stat = os.stat(path)  # identity BEFORE the memmap binds
    a, data_off = _open_matrix_memmap(path)
    n = a.shape[0]
    tb = SYMM_TB
    n_p = padded_size(n, tb)
    hit = pc.load(path, STORAGE)
    if hit is not None and hit[0] == n and hit[1] == n_p and hit[2] == tb:
        print(f"{os.path.basename(path)}: cache already valid",
              flush=True)
        return
    t0 = time.time()
    if _native_io.available() and _native_io.has_pack(STORAGE):
        bufs = getattr(_native_io, f"pack_{STORAGE}")(
            path, data_off, n, n_p, tb)
    else:
        bufs = DenseOperator._host_pack_tri(a, STORAGE, tb)
    ok = pc.save(path, STORAGE, n, n_p, tb, bufs, src_stat=src_stat)
    print(f"{os.path.basename(path)}: packed in {time.time() - t0:.0f}s"
          f" published={ok}", flush=True)


def main():
    for n in SIZES:
        path = os.path.join(HERE, "io", "bench",
                            f"lam_bench_spd_N{n}_s{SEED}.npy")
        if not os.path.exists(path):
            print(f"N={n}: no cached system (run gen_bench_caches.py)",
                  flush=True)
            continue
        prepack(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
