"""End-to-end verdict on LAM_Q16_IMPL=mxu: does the 646-vs-598 GB/s
inner matvec win survive the irfq refinement loop?

The MXU path bf16-rounds both dot operands (~2^-9 relative operator
error vs the int16 quantization's ~2^-16), so the inner CG solves a
rougher operator; with kappa ~ e^7 the refinement may need more inner
iterations and/or outer cycles, or stall above the inner tolerance
entirely. This measures the ACTUAL irfq solve (cg_solve_ir,
inner_floor=1e-2) on the N=20000 bench system with each impl in a
fresh subprocess (the knob is import-time: the q16 kernels are jitted
at module scope).

Writes results/Q16_E2E_r04.log. Needs the real TPU + the bench cache
(scripts/gen_bench_caches.py + prepack_bench_caches.py).
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N = int(os.environ.get("LAM_Q16_N", 20000))
SEED = 2024
LOG = os.path.join(HERE, "results", "Q16_E2E_r04.log")
CACHE = os.path.join(HERE, "io", "bench", f"lam_bench_spd_N{N}_s{SEED}.npy")


def child(impl):
    os.environ["LAM_Q16_IMPL"] = impl  # before lam_tpu import
    import numpy as np

    import jax

    from lam_tpu import DenseOperator, cg_solve_ir
    from lam_tpu import generate as gen

    assert jax.default_backend() == "tpu", "needs the real TPU"
    b = gen.random_rhs(N, seed=SEED + 10)
    bnorm = np.linalg.norm(b)

    t0 = time.perf_counter()
    opq = DenseOperator.from_file_fq(CACHE, pack_cache=True)
    opq32 = opq.as_f32()
    jax.block_until_ready(opq.operand)
    load_s = time.perf_counter() - t0

    _ = cg_solve_ir(opq32, opq, b, max_iters=30, rel_error=1e-2,
                    inner_floor=1e-2)  # compile
    best = None
    for _rep in range(3):
        t0 = time.perf_counter()
        res = cg_solve_ir(opq32, opq, b, max_iters=10000, rel_error=1e-9,
                          inner_floor=1e-2)
        float(res.rel_residual)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, res)
    dt, res = best

    a = np.load(CACHE, mmap_mode="r")
    x = np.asarray(res.x, np.float64)
    r = b.copy()
    blk = 4096
    for s in range(0, N, blk):
        r[s:s + blk] -= a[s:s + blk] @ x
    out = {"impl": impl, "solve_s": round(dt, 4),
           "iters": int(res.num_iters),
           "converged": bool(res.converged),
           "true_rel": float(np.linalg.norm(r) / bnorm),
           "load_s": round(load_s, 1)}
    print("E2E " + json.dumps(out), flush=True)


def main():
    if len(sys.argv) > 1:
        child(sys.argv[1])
        return 0
    if not os.path.exists(CACHE):
        print(f"no bench cache at {CACHE}", file=sys.stderr)
        return 1
    lines = [f"# irfq end-to-end, vpu vs mxu inner products "
             f"(scripts/q16_e2e.py), N={N}, inner_floor=1e-2"]
    for impl in ("vpu", "mxu"):
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), impl],
            env=env, capture_output=True, text=True, timeout=1800)
        for ln in proc.stdout.splitlines():
            if ln.startswith("E2E "):
                lines.append(ln[4:])
                print(ln[4:], flush=True)
                break
        else:
            tail = (proc.stderr or proc.stdout).splitlines()[-3:]
            lines.append(f'{{"impl": "{impl}", "error": {tail!r}}}')
            print(f"{impl} FAILED: {tail}", flush=True)
    with open(LOG, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {LOG}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
