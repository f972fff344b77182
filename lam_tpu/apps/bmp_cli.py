"""`lam-heat-to-bmp` — grid-to-image converter (heat_to_bmp.cpp parity).

Positional args `input_file.bin output_file.bmp`, defaults
`io/heat.bin io/heat.bmp`, fixed 0..100 temperature range
(heat_to_bmp.cpp:303-306).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    """Entry point: converts I/O and argument errors into the
    reference's clean print-to-stderr-and-exit behavior
    (ConjugateGradient_CPU_MPI_OMP.hpp:325-329; the reference never
    shows a backtrace on a missing or corrupt file)."""
    try:
        return _cli_main(argv)
    except (OSError, ValueError) as e:
        print(f"lam-heat-to-bmp: {e}", file=sys.stderr)
        return 1


def _cli_main(argv=None):
    p = argparse.ArgumentParser(prog="lam-heat-to-bmp")
    p.add_argument("input_file", nargs="?", default="io/heat.bin")
    p.add_argument("output_file", nargs="?", default="io/heat.bmp")
    p.add_argument("--min-temp", type=float, default=0.0)
    p.add_argument("--max-temp", type=float, default=100.0)
    args = p.parse_args(argv)

    from lam_tpu import io as lio
    from lam_tpu.apps import bmp

    print("Loading input grid ...")
    grid = lio.read_matrix(args.input_file)  # (ny, nx)
    print("Done\n")

    print("Converting grid to image ...")
    rgb = bmp.colormap(grid, args.min_temp, args.max_temp)
    print("Done\n")

    print("Writing image to file ...")
    bmp.write_bmp(args.output_file, rgb)
    print("Done\n")
    print("Finished successfully")
    return 0


if __name__ == "__main__":
    sys.exit(main())
