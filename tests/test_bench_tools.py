"""Benchmark runner + results post-processor (reference harness analogs)."""

import numpy as np

from lam_tpu.bench import clean, runner


def test_runner_gen_sweep(tmp_path, capsys):
    out = tmp_path / "gen.csv"
    rc = runner.main(["--sizes", "128", "256", "--mode", "gen",
                      "-o", str(out)])
    assert rc == 0
    rows = out.read_text().strip().splitlines()
    assert len(rows) == 2
    for row, n in zip(rows, (128, 256)):
        f = row.split(",")
        assert len(f) == 9
        assert int(f[0]) == n
        # gen-mode cap: the reference CSV records the loop-exit
        # value max_iters+1 (BEST_RESULTS:173-236 shows 16)
        assert int(f[6]) == 16


def test_runner_spd_mode(tmp_path):
    out = tmp_path / "spd.csv"
    rc = runner.main(["--sizes", "96", "--mode", "spd", "-o", str(out),
                      "-i", "1000"])
    assert rc == 0
    f = out.read_text().strip().split(",")
    assert float(f[7]) < 1e-9  # converged to tolerance


def test_clean_best_pick(tmp_path):
    data = tmp_path / "MERGE_test.txt"
    data.write_text(
        "this is a header line\n"
        "\n"
        "20000,8,1,1.0,0.1,0.2,350,1e-10,2.5\n"
        "10000,4,1,1.0,0.1,0.2,350,1e-10,9.9\n"
        "10000,4,1,1.0,0.1,0.2,350,1e-10,3.3\n"
        "20000,8,1,1.0,0.1,0.2,350,1e-10,2.1\n")
    best = tmp_path / "BEST"
    rc = clean.main([str(data), "-o", str(best)])
    assert rc == 0
    # source file cleaned + sorted like clean.sh
    cleaned = data.read_text().strip().splitlines()
    assert len(cleaned) == 4
    assert cleaned[0].startswith("10000")
    txt = best.read_text()
    assert "10000,4,1,1.0,0.1,0.2,350,1e-10,3.3" in txt
    assert "20000,8,1,1.0,0.1,0.2,350,1e-10,2.1" in txt
    assert "9.9" not in txt.split("File:")[-1]
