"""CLI smoke tests covering every subcommand (the reference's examples/)."""

import os
import shutil

import numpy as np

import pytest

from bliss_tpu.cli import main


@pytest.fixture(scope="module")
def library(tmp_path_factory):
    if not os.path.isdir("/root/reference/audio"):
        pytest.skip("reference audio fixtures not available")
    d = tmp_path_factory.mktemp("lib")
    for name in ("song.flac", "song_s32.flac", "song_s32_mono.flac"):
        shutil.copy(f"/root/reference/audio/{name}", d / name)
    return d


def test_cli_analyze(capsys, fixture_dir):
    rc = main(["analyze", os.path.join(fixture_dir, "song.flac")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Force vector: (-8.9454" in out
    assert "Calm or loud: Calm" in out
    assert "Artist: David TMX" in out
    assert "Number of samples: 488138" in out


def test_cli_distance(capsys, fixture_dir):
    rc = main([
        "distance",
        os.path.join(fixture_dir, "song.flac"),
        os.path.join(fixture_dir, "song_s32.flac"),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Distance between the two songs: 0.7" in out
    assert "Cosine similarity between the two songs: 0.99" in out


def test_cli_detect_gapless(capsys, fixture_dir):
    f = os.path.join(fixture_dir, "song.flac")
    rc = main(["detect-gapless", f, f])
    out = capsys.readouterr().out
    # the fixture fades out to near-silence, so its own head/tail don't link
    assert "Not Gapless." in out
    assert rc == 0


def test_cli_ml_analyze(capsys, library, tmp_path):
    out_file = tmp_path / "ml.csv"
    rc = main(["ml-analyze", str(library / "song.flac"), "-o", str(out_file),
               "--batch-size", "2"])
    assert rc == 0
    line = out_file.read_text().strip()
    parts = line.split(";")
    assert parts[0] == "song"
    assert abs(float(parts[1]) - (-8.945454)) < 1e-3


def test_cli_scan_and_playlist(capsys, library, tmp_path):
    csv = tmp_path / "features.csv"
    store = tmp_path / "store"
    rc = main([
        "scan", str(library), "-o", str(csv), "--store", str(store),
        "--batch-size", "2",
    ])
    assert rc == 0
    lines = csv.read_text().strip().splitlines()
    assert lines[0].startswith("filename;tempo")
    assert len(lines) == 4  # header + 3 songs

    m3u = tmp_path / "p.m3u"
    rc = main([
        "playlist", str(library / "song.flac"), str(library),
        "-o", str(m3u), "--store", str(store), "--batch-size", "2",
    ])
    assert rc == 0
    entries = m3u.read_text().strip().splitlines()
    assert entries[0] == "#EXTM3U"
    assert entries[1].endswith("song.flac")  # seed is its own nearest
    assert len(entries) == 4


def test_cli_store_neighbors(capsys, library, tmp_path):
    """Warm-store top-k: zero re-analysis, every song's closest others."""
    store = tmp_path / "store"
    rc = main([
        "scan", str(library), "-o", str(tmp_path / "f.csv"),
        "--store", str(store), "--batch-size", "2",
    ])
    assert rc == 0
    capsys.readouterr()
    out_csv = tmp_path / "nn.csv"
    rc = main([
        "store", "--top-k", "2", "-o", str(out_csv), "neighbors", str(store),
    ])
    assert rc == 0
    lines = out_csv.read_text().strip().splitlines()
    assert lines[0] == "filename;neighbor1;distance1;neighbor2;distance2"
    assert len(lines) == 4  # header + 3 songs
    # song.flac and song_s32.flac are nearly the same audio -> mutual
    # nearest neighbors with a small distance
    row = {l.split(";")[0]: l.split(";")[1:] for l in lines[1:]}
    s16 = next(k for k in row if k.endswith("/song.flac"))
    assert row[s16][0].endswith("song_s32.flac")
    # the same pair the reference's distance example reports ~0.7286 for
    assert float(row[s16][1]) == pytest.approx(0.72859, abs=2e-3)


def test_cli_playlist_meshed(capsys, library, tmp_path):
    """--mesh on playlist (round 3: the mesh is reachable from every
    library command, not just scan)."""
    m3u = tmp_path / "p.m3u"
    rc = main([
        "playlist", str(library / "song.flac"), str(library),
        "-o", str(m3u), "--batch-size", "2", "--mesh", "2x2",
    ])
    assert rc == 0
    entries = m3u.read_text().strip().splitlines()
    assert entries[0] == "#EXTM3U"
    assert entries[1].endswith("song.flac")
    assert len(entries) == 4


def test_cli_radio(capsys, library, tmp_path):
    rc = main([
        "radio", str(library), "--clusters", "2",
        "--output-dir", str(tmp_path), "--store", str(tmp_path / "st"),
        "--batch-size", "2",
    ])
    assert rc == 0
    m3us = sorted(p for p in os.listdir(tmp_path) if p.endswith(".m3u"))
    assert len(m3us) == 2


def test_cli_version(capsys):
    rc = main(["version"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "bliss-tpu" in out


def test_cli_detect_gapless_positive(tmp_path, capsys):
    """Two crafted WAVs whose boundary samples match -> 'Gapless!'."""
    import wave

    import numpy as np

    def write_wav(path, data):
        with wave.open(str(path), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(22050)
            w.writeframes(np.asarray(data, np.int16).tobytes())

    a = np.full((22050, 2), 1200, np.int16)
    b = np.full((22050, 2), 1205, np.int16)  # diff 5/32767 << 0.01
    write_wav(tmp_path / "a.wav", a)
    write_wav(tmp_path / "b.wav", b)
    rc = main([
        "detect-gapless", str(tmp_path / "a.wav"), str(tmp_path / "b.wav"),
    ])
    out = capsys.readouterr().out
    assert "Gapless!" in out
    assert rc == 1  # the reference exits 1 on gapless detection


def test_cli_scan_extended(library, tmp_path):
    csv = tmp_path / "ext.csv"
    rc = main([
        "scan", str(library / "song.flac"), "-o", str(csv),
        "--batch-size", "2", "--extended",
    ])
    assert rc == 0
    lines = csv.read_text().strip().splitlines()
    assert "mfcc_0" in lines[0]
    assert len(lines[1].split(";")) == len(lines[0].split(";"))


def test_cli_analyze_extended(capsys, fixture_dir):
    rc = main(["analyze", "--extended", os.path.join(fixture_dir, "song.flac")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "zero_crossing_rate:" in out
    assert "mfcc_0:" in out
    assert "spectral_centroid_hz:" in out


def test_cli_analyze_filterbank_option(fixture_dir, capsys):
    from bliss_tpu.cli import main

    rc = main([
        "analyze", os.path.join(fixture_dir, "song.flac"),
        "--filterbank", "reference5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # multi-band attack/tempo are on a different (band-summed) scale than
    # the 1-band parity values; amplitude/frequency are unchanged
    fv = [l for l in out.splitlines() if l.startswith("Force vector")][0]
    vals = [float(v) for v in fv.split("(")[1].rstrip(")").split(",")]
    assert abs(vals[1] - (-10.641836)) < 1e-3  # amplitude unchanged
    assert vals[3] < -100  # 5-band attack sum scale


def test_cli_store_stats_and_compact(fixture_dir, tmp_path, capsys):
    from bliss_tpu.cli import main
    from bliss_tpu.pipeline import analyze_library
    from bliss_tpu.store import FeatureStore

    store_dir = str(tmp_path / "store")
    files = [os.path.join(fixture_dir, "song.flac"),
             os.path.join(fixture_dir, "song_s32.flac")]
    analyze_library(files, batch_size=1, store=FeatureStore(store_dir))

    assert main(["store", "stats", store_dir]) == 0
    out = capsys.readouterr().out
    assert "entries: 2" in out

    assert main(["store", "compact", store_dir]) == 0
    out = capsys.readouterr().out
    assert "-> 1" in out
    # entries intact after compaction
    assert len(FeatureStore(store_dir)) == 2


def test_cli_store_export_and_prune(fixture_dir, tmp_path, capsys):
    """`store export` serves the scan CSV (plus tags) from a warm store with
    zero re-analysis; `store prune` drops entries whose files vanished."""
    from bliss_tpu.cli import main
    from bliss_tpu.pipeline import analyze_library
    from bliss_tpu.store import FeatureStore

    lib = tmp_path / "lib"
    lib.mkdir()
    for name in ("song.flac", "song_s32.flac"):
        (lib / name).write_bytes(
            open(os.path.join(fixture_dir, name), "rb").read()
        )
    store_dir = str(tmp_path / "store")
    files = [str(lib / "song.flac"), str(lib / "song_s32.flac")]
    analyze_library(files, batch_size=2, store=FeatureStore(store_dir))

    out_csv = str(tmp_path / "warm.csv")
    assert main(["store", "export", store_dir, "-o", out_csv]) == 0
    lines = open(out_csv).read().splitlines()
    assert lines[0].startswith(
        "filename;title;artist;album;genre;tracknumber;tempo"
    )
    assert len(lines) == 3
    row = {ln.split(";")[0]: ln.split(";") for ln in lines[1:]}
    r = row[str(lib / "song.flac")]
    assert r[1:6] == ["Renaissance", "David TMX", "Renaissance", "Pop", "02"]
    # golden values straight from the store (reference tests/test_analyze.c)
    assert abs(float(r[6]) - (-8.945454)) < 1e-3   # tempo
    assert abs(float(r[10]) - (-20.777929)) < 1e-3  # force

    # prune: nothing missing -> no-op; delete one file -> one entry pruned
    assert main(["store", "prune", store_dir]) == 0
    assert "pruned 0" in capsys.readouterr().out
    os.remove(str(lib / "song_s32.flac"))
    assert main(["store", "prune", store_dir]) == 0
    assert "pruned 1" in capsys.readouterr().out
    reloaded = FeatureStore(store_dir)
    assert len(reloaded) == 1
    metas = [reloaded.metadata(k) for k, _ in reloaded.items()]
    assert metas[0]["filename"] == str(lib / "song.flac")


def test_cli_scan_with_mesh(fixture_dir, tmp_path):
    """--mesh shards the scan over the virtual device mesh."""
    from bliss_tpu.cli import main

    out = str(tmp_path / "f.csv")
    rc = main([
        "scan", os.path.join(fixture_dir, "song.flac"),
        os.path.join(fixture_dir, "song_s32.flac"),
        "-o", out, "--mesh", "4x2", "--batch-size", "2",
    ])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 3  # header + 2 songs
    tempo = float(lines[1].split(";")[1])
    assert abs(tempo - (-8.945454)) < 1e-3


def test_cli_store_export_quotes_delimiter_in_tags(tmp_path):
    """A tag containing the ';' CSV delimiter must be quoted, not shift
    every later column."""
    import csv

    from bliss_tpu.cli import main
    from bliss_tpu.store import FeatureStore

    store_dir = str(tmp_path / "store")
    s = FeatureStore(store_dir)
    s.put(
        "k1", np.array([0.1, -1.0, 2.0, -0.5], np.float32),
        {"filename": "x.flac", "album": "Greatest Hits; Vol. 2",
         "title": "A;B"},
    )
    s.flush()
    out_csv = str(tmp_path / "warm.csv")
    assert main(["store", "export", store_dir, "-o", out_csv]) == 0
    with open(out_csv, newline="") as f:
        rows = list(csv.reader(f, delimiter=";"))
    assert rows[0][:6] == [
        "filename", "title", "artist", "album", "genre", "tracknumber"
    ]
    row = rows[1]
    assert row[1] == "A;B"
    assert row[3] == "Greatest Hits; Vol. 2"
    # numeric columns still land under the right headers
    assert float(row[6]) == pytest.approx(0.1, abs=1e-6)       # tempo
    assert float(row[10]) == pytest.approx(1.1, abs=1e-5)      # force


def test_cli_store_neighbors_rejects_bad_top_k(tmp_path, capsys):
    from bliss_tpu.cli import main
    from bliss_tpu.store import FeatureStore

    store_dir = str(tmp_path / "store")
    s = FeatureStore(store_dir)
    s.put("k1", np.zeros(4, np.float32), {"filename": "a"})
    s.put("k2", np.ones(4, np.float32), {"filename": "b"})
    s.flush()
    for bad in ("0", "-1"):
        rc = main(["store", "--top-k", bad, "neighbors", store_dir])
        assert rc == 2
        assert "--top-k must be >= 1" in capsys.readouterr().err


def test_cli_platform_flag_and_env_fallback(monkeypatch, capsys):
    """--platform pins jax_platforms before any backend touch; the env var
    is the default. (On plugin-pinned hosts JAX_PLATFORMS is ignored, so
    the CLI needs an in-process pin.)"""
    import jax

    from bliss_tpu.cli import build_parser, main

    assert build_parser().parse_args(
        ["--platform", "cpu", "version"]).platform == "cpu"
    monkeypatch.setenv("BLISS_TPU_PLATFORM", "cpu")
    assert build_parser().parse_args(["version"]).platform == "cpu"
    monkeypatch.delenv("BLISS_TPU_PLATFORM")
    assert build_parser().parse_args(["version"]).platform is None

    # main() applies it (config already cpu under the test harness, so the
    # update is a no-op rewrite, but the code path runs)
    assert main(["--platform", "cpu", "version"]) == 0
    assert "bliss-tpu" in capsys.readouterr().out
    assert jax.config.jax_platforms == "cpu"


def test_cli_platform_flag_subprocess_fresh_process(tmp_path):
    """In a fresh process `--platform cpu` must keep the whole run off the
    accelerator plugin (this is the documented escape hatch where
    JAX_PLATFORMS is overridden by a plugin)."""
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "-c",
         "from bliss_tpu.cli import main; import jax, sys; "
         "rc = main(['--platform', 'cpu', 'version']); "
         "assert jax.config.jax_platforms == 'cpu'; sys.exit(rc)"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "bliss-tpu" in r.stdout


def test_cli_store_dupes(tmp_path, capsys):
    """`store dupes` surfaces perceptual-duplicate pairs (near-zero
    force-vector distance) from the warm store, nearest first, and honors
    --threshold."""
    from bliss_tpu.cli import main
    from bliss_tpu.store import FeatureStore

    store_dir = str(tmp_path / "store")
    s = FeatureStore(store_dir)
    s.put("k1", np.array([0.10, -1.0, 2.0, -0.5], np.float32),
          {"filename": "a.flac"})
    s.put("k2", np.array([0.12, -1.0, 2.0, -0.5], np.float32),
          {"filename": "a_remaster.flac"})  # 0.02 from k1
    s.put("k3", np.array([5.0, 3.0, -4.0, 2.0], np.float32),
          {"filename": "other.flac"})      # far from both
    s.flush()

    assert main(["store", "dupes", store_dir]) == 0
    rows = [r.split(";") for r in
            capsys.readouterr().out.strip().splitlines()]
    assert rows[0] == ["song_a", "song_b", "distance"]
    assert len(rows) == 2  # exactly one candidate pair
    assert {rows[1][0], rows[1][1]} == {"a.flac", "a_remaster.flac"}
    # f32 |a|^2+|b|^2-2ab matmul form: small absolute error is expected
    assert float(rows[1][2]) == pytest.approx(0.02, abs=1e-3)

    # a tight threshold excludes even the near pair
    assert main(["store", "--threshold", "0.001", "dupes", store_dir]) == 0
    rows = capsys.readouterr().out.strip().splitlines()
    assert len(rows) == 1  # header only

    # file output
    out_csv = str(tmp_path / "d.csv")
    assert main(["store", "dupes", store_dir, "-o", out_csv]) == 0
    capsys.readouterr()
    with open(out_csv) as f:
        assert len(f.read().strip().splitlines()) == 2

    # <2 entries is a usage error
    lone = str(tmp_path / "lone")
    s2 = FeatureStore(lone)
    s2.put("only", np.zeros(4, np.float32), {"filename": "x"})
    s2.flush()
    assert main(["store", "dupes", lone]) == 2


def test_cli_doctor_all_green(capsys, tmp_path):
    """doctor on a healthy CPU environment: every check ok, exit 0."""
    from bliss_tpu.cli import main
    from bliss_tpu.store import FeatureStore

    store_dir = str(tmp_path / "store")
    s = FeatureStore(store_dir)
    s.put("k", np.zeros(4, np.float32), {"filename": "x"})
    s.flush()
    rc = main(["doctor", "--store", store_dir])
    out = capsys.readouterr().out
    assert rc == 0
    assert "all checks passed" in out
    assert "ok native decoder build" in out
    assert "ok decode round-trip" in out
    assert "ok backend acquisition: cpu" in out
    assert "ok device dispatch" in out
    assert "ok feature store: 1 entry" in out


def test_cli_doctor_hung_device_fails_cleanly(capsys, monkeypatch):
    """A hung device probe must FAIL the check within --timeout instead of
    wedging the doctor (the remote-tunnel hang mode)."""
    import time

    import jax

    from bliss_tpu.cli import main

    real_put = jax.device_put
    monkeypatch.setattr(
        jax, "device_put", lambda *a, **k: time.sleep(3600)
    )
    try:
        rc = main(["doctor", "--timeout", "0.3"])
    finally:
        monkeypatch.setattr(jax, "device_put", real_put)
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL device dispatch" in out and "blocked after" in out
    assert "1 check(s) FAILED" in out
