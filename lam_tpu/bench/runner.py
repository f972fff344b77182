"""`lam-bench` — benchmark sweep runner (reference TESTS/ harness analog).

The reference drives its matrix-size / device-count sweeps with ~24 SLURM
scripts (TESTS/CPU_SCRIPTS, TESTS/GPU_SCRIPTS: file mode N=10k..70k,
gen mode N=80k..200k capped at -i 15) and post-processes the CSV corpus
with awk (TESTS/results/clean.sh). Here one runner replays the sweeps on
whatever devices are visible and appends rows in the SAME CSV format, and
`lam_tpu.bench.clean` reproduces the merge/sort/best-pick step.

Examples:
  lam-bench --sizes 1000 2000 4000 --mode gen -i 15 -o results/gen.csv
  lam-bench --sizes 10000 20000 --mode spd -o results/file.csv
  python -m lam_tpu.bench.clean results/*.csv -o results/BEST_RESULTS
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def run_one(n, mode, max_iters, rel_error, backend, precision, engine,
            devices, seed=2024, comm="gather", pack_cache=False):
    import jax

    from lam_tpu import generate as gen
    from lam_tpu.solver.api import ConjugateGradient

    cg = ConjugateGradient(backend=backend, precision=precision,
                           engine=engine, n_devices=devices, comm=comm,
                           pack_cache=pack_cache)
    t0 = time.perf_counter()
    if mode == "gen":
        cg.generate_matrix(n)
        cg.generate_rhs()
    elif pack_cache:
        # reproducible large-N sweeps (round 5): reuse/publish the .npy
        # system cache bench.py uses (lam_tpu/bench/systems.py), then
        # load THROUGH the file path so the packed-plane caches beside
        # it apply — a warm re-run is solve-bound, never
        # regeneration-bound (Householder at N=40000 is ~30 min on a
        # 1-core host; the reference's sweeps equally re-read
        # pre-generated files, TESTS/GPU_SCRIPTS/GPU_2_NODE.sh:33-39)
        from lam_tpu.bench import systems
        path = systems.find_cached(n, seed)
        if path is None:
            a = (gen.random_spd_matrix_fast(n, seed=seed) if n > 4096
                 else gen.random_spd_matrix(n, seed=seed))
            path = systems.publish(a, n, seed)
            del a
        if path is None:
            raise OSError(f"no writable cache dir for the N={n} system")
        cg.load_matrix_from_file(path)
        cg.rhs = gen.random_rhs(n, seed=seed + 10)
    else:
        # in-memory random SPD system (same construction the offline
        # generator writes to disk; avoids materializing N^2*8 B files)
        a = (gen.random_spd_matrix_fast(n, seed=seed) if n > 4096
             else gen.random_spd_matrix(n, seed=seed))
        cg.n = n
        cg.op = cg._build_operator(lambda s, m: a[s:s + m, :], n,
                                   full_matrix=a)
        jax.block_until_ready(cg.op.operand)
        cg.rhs = gen.random_rhs(n, seed=seed + 10)
    load_s = time.perf_counter() - t0
    cg.solve(max_iters, rel_error)
    avg_gemv = cg.measure_gemv()
    t = cg.timings
    n_dev = cg.used_devices()
    return (f"{n},{n_dev},1,{load_s:g},{avg_gemv:g},{t['avg_iter_s']:g},"
            f"{t.get('csv_num_iters', t['num_iters'])},"
            f"{t['rel_residual']:g},{t['solve_s']:g}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="lam-bench")
    p.add_argument("--sizes", type=int, nargs="+", required=True)
    p.add_argument("--mode", choices=["gen", "spd"], default="gen")
    p.add_argument("-i", dest="max_iters", type=int, default=None,
                   help="default: 15 for gen (reference cap), 10000 for spd")
    p.add_argument("-e", dest="rel_error", type=float, default=1e-9)
    p.add_argument("-o", dest="output", default=None,
                   help="append CSV rows here (default: stdout only)")
    p.add_argument("--backend", default="auto")
    p.add_argument("--precision", default="auto")
    p.add_argument("--engine", default="auto")
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--comm", default="gather", choices=["gather", "ring"])
    p.add_argument("--seed", type=int, default=2024,
                   help="spd-mode system seed (shared with bench.py)")
    p.add_argument("--pack-cache", action="store_true",
                   help="spd mode: reuse/publish the .npy system cache "
                        "(io/bench/, shared with bench.py) and load via "
                        "the file path so packed-plane caches beside it "
                        "apply — warm sweeps are solve-bound, not "
                        "regeneration-bound")
    args = p.parse_args(argv)

    max_iters = args.max_iters
    if max_iters is None:
        # gen mode is the reference's capped throughput probe
        # (GPU_4_NODE_gen.sh:36-44)
        max_iters = 15 if args.mode == "gen" else 10000

    rows = []
    for n in args.sizes:
        row = run_one(n, args.mode, max_iters, args.rel_error,
                      args.backend, args.precision, args.engine,
                      args.devices, seed=args.seed, comm=args.comm,
                      pack_cache=args.pack_cache)
        print(row, flush=True)
        rows.append(row)

    if args.output:
        os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                    exist_ok=True)
        with open(args.output, "a") as f:
            for row in rows:
                f.write(row + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
