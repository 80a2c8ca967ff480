"""Headless tests for the GUI scanner's core (bliss_tpu/gui.py).

The reference's GTK scanner (reference: python/examples/analyze_gui.py)
has no test at all; here the scan logic is a display-free ScanJob, so the
whole contract — mimetype discovery, background analysis, the
'|'-delimited CSV schema, cancellation — is exercised under pytest.
"""

import csv
import importlib.util
import os
import shutil
import sys

import pytest

from bliss_tpu import gui as analyze_gui


def test_example_wrapper_reexports():
    """examples/analyze_gui.py (the reference-parity entry point) exposes
    the packaged implementation."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "analyze_gui.py",
    )
    spec = importlib.util.spec_from_file_location("analyze_gui_example", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["analyze_gui_example"] = mod
    spec.loader.exec_module(mod)
    assert mod.ScanJob is analyze_gui.ScanJob
    assert mod.discover_audio_files is analyze_gui.discover_audio_files


@pytest.fixture(scope="module")
def library(tmp_path_factory):
    if not os.path.isdir("/root/reference/audio"):
        pytest.skip("reference audio fixtures not available")
    d = tmp_path_factory.mktemp("guilib")
    for name in ("song.flac", "song_s32.flac"):
        shutil.copy(f"/root/reference/audio/{name}", d / name)
    (d / "notes.txt").write_text("not audio")
    sub = d / "sub"
    sub.mkdir()
    shutil.copy("/root/reference/audio/song_s32_mono.flac", sub / "deep.flac")
    return d


def test_discover_filters_and_recursion(library):
    flat = analyze_gui.discover_audio_files(str(library))
    assert [os.path.basename(f) for f in flat] == ["song.flac", "song_s32.flac"]
    deep = analyze_gui.discover_audio_files(str(library), recursive=True)
    assert any(f.endswith("deep.flac") for f in deep) and len(deep) == 3
    assert not any(f.endswith("notes.txt") for f in deep)
    assert analyze_gui.discover_audio_files(str(library / "missing")) == []


def test_scanjob_headless_end_to_end(library, tmp_path):
    out = tmp_path / "out.csv"
    progress, done = [], []
    job = analyze_gui.ScanJob(
        str(library),
        str(out),
        on_progress=lambda d, t, m: progress.append((d, t)),
        on_done=lambda rows, cancelled: done.append((rows, cancelled)),
    )
    rows = job.run()  # synchronously, on this thread
    assert rows == 2 and done == [(2, False)]
    assert progress and progress[-1][0] == progress[-1][1] == 2

    with open(out, newline="") as fh:
        data = list(csv.reader(fh, **analyze_gui.CSV_DIALECT))
    assert len(data) == 2
    # the reference's exact column order: filename, album, attack, tempo,
    # amplitude, frequency (analyze_gui.py:48) — cross-check row 0 against
    # the Song API on the same file
    from bliss_tpu import api

    fname, album, attack, tempo, amplitude, frequency = data[0]
    assert fname.endswith("song.flac") and album == "Renaissance"
    with api.Song(fname) as song:
        fv = song["force_vector"]
        assert float(attack) == pytest.approx(fv["attack"], abs=1e-5)
        assert float(tempo) == pytest.approx(fv["tempo"], abs=1e-5)
        assert float(amplitude) == pytest.approx(fv["amplitude"], abs=1e-5)
        assert float(frequency) == pytest.approx(fv["frequency"], abs=1e-5)


def test_scanjob_cancel_drains_to_partial_csv(library, tmp_path):
    out = tmp_path / "out.csv"
    done = []
    job = analyze_gui.ScanJob(
        str(library), str(out), on_done=lambda r, c: done.append((r, c))
    )
    job.cancel()  # cancelled before it starts: drains to an empty scan
    job.run()
    assert done == [(0, True)]
    with open(out, newline="") as fh:
        assert list(csv.reader(fh, **analyze_gui.CSV_DIALECT)) == []


def test_scanjob_empty_dir_reports_error(tmp_path):
    errs = []
    job = analyze_gui.ScanJob(
        str(tmp_path), str(tmp_path / "o.csv"), on_error=errs.append
    )
    assert job.run() == 0
    assert errs == ["Please enter a valid directory containing audio files"]
    assert not (tmp_path / "o.csv").exists()


def test_scanjob_threaded_start_join(library, tmp_path):
    out = tmp_path / "out.csv"
    done = []
    job = analyze_gui.ScanJob(
        str(library), str(out), on_done=lambda r, c: done.append((r, c))
    )
    job.start()
    job.join(timeout=300)
    assert not job.running and done == [(2, False)]
