"""Decode parity: the MD5 / metadata oracles from the reference tests
(reference: tests/test_decode.c, tests/test_analyze.c:36-55)."""

import hashlib
import os

import numpy as np
import pytest

from bliss_tpu.io import DecodeError, decode, decode_batch, iter_decode

EXPECT = {
    "song.flac": dict(
        md5="8a1bd824951c0433cc47fec5bf41d0a9",
        n_samples=488138,
        bitrate=233864,
        resampled=0,
    ),
    "song_s32.flac": dict(
        md5="eb9f31a7b9ed022d66ff82b76e7c3c18",
        n_samples=488140,
        bitrate=840742,
        resampled=1,
    ),
    "song_s32_mono.flac": dict(
        md5="747dbfcd75bebc23ebe2024935aede36",
        resampled=1,
    ),
}


@pytest.mark.parametrize("name", sorted(EXPECT))
def test_decode_md5_parity(fixture_dir, name):
    d = decode(os.path.join(fixture_dir, name))
    exp = EXPECT[name]
    assert hashlib.md5(d.samples.tobytes()).hexdigest() == exp["md5"]
    assert d.sample_rate == 22050
    assert d.channels == 2
    assert d.nb_bytes_per_sample == 2
    assert d.duration == 11
    assert d.resampled == exp["resampled"]
    if "n_samples" in exp:
        assert d.n_samples == exp["n_samples"]
    if "bitrate" in exp:
        assert d.bitrate == exp["bitrate"]


def test_decode_tags(decoded_song):
    assert decoded_song.artist == "David TMX"
    assert decoded_song.title == "Renaissance"
    assert decoded_song.album == "Renaissance"
    assert decoded_song.tracknumber == "02"
    assert decoded_song.genre == "Pop"


def test_decode_missing_file_raises():
    with pytest.raises(DecodeError):
        decode("/nonexistent/nope.flac")


def test_decode_garbage_raises(tmp_path):
    p = tmp_path / "noise.mp3"
    p.write_bytes(b"\x00" * 1024)
    with pytest.raises(DecodeError):
        decode(str(p))


def test_decode_batch_skip_isolation(fixture_dir, tmp_path):
    bad = tmp_path / "bad.flac"
    bad.write_bytes(b"not audio")
    files = [
        os.path.join(fixture_dir, "song.flac"),
        str(bad),
        os.path.join(fixture_dir, "song_s32.flac"),
    ]
    out = decode_batch(files, on_error="skip")
    assert out[0] is not None and out[2] is not None
    assert out[1] is None


def test_iter_decode_order(fixture_dir):
    files = [os.path.join(fixture_dir, "song.flac")] * 3
    got = list(iter_decode(files))
    assert [f for f, _ in got] == files
    assert all(d is not None for _, d in got)


def test_interleaved_frame_view(decoded_song):
    fr = decoded_song.as_frames()
    assert fr.shape == (decoded_song.n_samples // 2, 2)
    assert np.array_equal(fr.reshape(-1), decoded_song.samples)


def test_decode_wav_resample_path(tmp_path):
    """Generated 44.1 kHz mono WAV exercises the full canonicalization:
    rate resample + mono->stereo upmix + s16 passthrough."""
    import wave

    sr = 44100
    t = np.arange(sr * 2)
    tone = (10000 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    p = tmp_path / "tone.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())

    d = decode(str(p))
    assert d.sample_rate == 22050
    assert d.channels == 2
    assert d.resampled == 1
    # ~2 seconds at the target rate, stereo interleaved
    assert abs(d.n_samples - 2 * 22050 * 2) < 4 * 22050 * 0.01
    fr = d.as_frames()
    # mono upmix: both channels identical
    assert np.array_equal(fr[:, 0], fr[:, 1])
    # the 440 Hz tone survives: dominant bin of an FFT near 440
    seg = fr[2048 : 2048 + 8192, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec) * 22050 / len(seg)
    assert abs(peak_hz - 440) < 5


def test_flac_writer_roundtrip(tmp_path):
    """Our verbatim FLAC writer roundtrips bit-exactly through libav."""
    from bliss_tpu.io.flac_writer import write_flac

    rng = np.random.RandomState(5)
    frames = rng.randint(-32768, 32768, size=(22050 * 2 + 777, 2)).astype(
        np.int16
    )
    p = tmp_path / "rt.flac"
    write_flac(str(p), frames, 22050)
    d = decode(str(p))
    assert d.sample_rate == 22050 and d.channels == 2 and d.resampled == 0
    got = d.as_frames()
    pad = (-frames.shape[0]) % 4096
    exp = np.vstack([frames, np.zeros((pad, 2), np.int16)])
    assert np.array_equal(got, exp)


def test_flac_writer_long_file_roundtrip(tmp_path):
    """Files past 128 frames (~24 s) need multi-byte frame numbers; the
    original coding emitted an invalid lead marker and every decoder
    silently truncated there (round-3 bug). Pin the fix end-to-end plus
    the coded-number values against real UTF-8."""
    from bliss_tpu.io.flac_writer import _utf8_coded_number, write_flac

    for n in (0x7F, 0x80, 0x100, 0x7FF, 0x800, 0xFFFF):
        assert _utf8_coded_number(n) == chr(n).encode("utf-8"), hex(n)

    rng = np.random.RandomState(6)
    frames = (rng.randn(22050 * 30, 2) * 3000).astype(np.int16)  # 30 s
    p = tmp_path / "long.flac"
    write_flac(str(p), frames, 22050)
    d = decode(str(p))
    assert d.n_frames >= frames.shape[0]  # nothing truncated
    assert np.array_equal(d.as_frames()[: frames.shape[0]], frames)


def test_flac_writer_pooled_frames_roundtrip(tmp_path):
    """stream_header + frame_bytes composition (the bulk e2e generator's
    path) decodes to exactly the composed blocks."""
    from bliss_tpu.io.flac_writer import _BLOCK, frame_bytes, stream_header

    rng = np.random.RandomState(7)
    blocks = [
        (rng.randn(_BLOCK, 2) * 2000).astype(np.int16) for _ in range(3)
    ]
    seq = [0, 2, 1, 0, 2]
    p = tmp_path / "pooled.flac"
    with open(p, "wb") as f:
        f.write(stream_header(len(seq) * _BLOCK))
        for fi, ci in enumerate(seq):
            f.write(frame_bytes(blocks[ci], fi))
    d = decode(str(p))
    exp = np.vstack([blocks[ci] for ci in seq])
    assert np.array_equal(d.as_frames(), exp)


def test_flac_writer_tags(tmp_path):
    from bliss_tpu.io.flac_writer import write_flac

    frames = np.zeros((8192, 2), np.int16)
    frames[100:, 0] = 500
    p = tmp_path / "tagged.flac"
    write_flac(
        str(p), frames, 22050,
        tags={"ARTIST": "Unit Test", "TITLE": "Tagged", "ALBUM": "Cases",
              "TRACKNUMBER": "7/12", "GENRE": "Synthetic"},
    )
    d = decode(str(p))
    assert d.artist == "Unit Test"
    assert d.title == "Tagged"
    assert d.album == "Cases"
    assert d.tracknumber == "7"  # truncated at '/', like the reference
    assert d.genre == "Synthetic"


def test_decode_tag_defaults(tmp_path):
    from bliss_tpu.io.flac_writer import write_flac

    frames = np.zeros((4096, 2), np.int16)
    frames[10, 0] = 100
    p = tmp_path / "untagged.flac"
    write_flac(str(p), frames, 22050)
    d = decode(str(p))
    # reference defaults (src/decode.c:261-309)
    assert d.artist == "<no artist>"
    assert d.title == "<no title>"
    assert d.album == "<no album>"
    assert d.tracknumber == ""
    assert d.genre == "<no genre>"


def test_mono_s16_native_rate_upmixes(tmp_path):
    """Mono s16 @ 22.05 kHz must still come out stereo. (The reference's
    decode skips the channel check when format+rate already match, leaving a
    mono buffer labeled stereo — reference src/decode.c:314-318,193; we
    resample/upmix instead.)"""
    from bliss_tpu.io.flac_writer import write_flac

    rng = np.random.RandomState(6)
    mono = rng.randint(-20000, 20000, size=(12288, 1)).astype(np.int16)
    p = tmp_path / "mono16.flac"
    write_flac(str(p), mono, 22050)
    d = decode(str(p))
    assert d.channels == 2
    assert d.resampled == 1
    fr = d.as_frames()
    assert fr.shape[0] == mono.shape[0]
    assert np.array_equal(fr[:, 0], fr[:, 1])


# ---- metadata-only probe ---------------------------------------------------


def test_probe_tags_match_decode(fixture_dir):
    """bt_probe reads the same tag surface as a full decode, without PCM."""
    from bliss_tpu.io import probe

    for f in [os.path.join(fixture_dir, n) for n in sorted(EXPECT)]:
        p = probe(f)
        d = decode(f)
        assert (p.title, p.artist, p.album, p.genre, p.tracknumber) == (
            d.title, d.artist, d.album, d.genre, d.tracknumber,
        )
        assert p.duration == d.duration
        assert p.bitrate == d.bitrate


def test_probe_is_much_cheaper_than_decode(fixture_dir):
    import time

    from bliss_tpu.io import probe

    f = os.path.join(fixture_dir, "song_s32.flac")
    probe(f)
    decode(f)  # warm the page cache + lib
    t0 = time.time()
    for _ in range(20):
        probe(f)
    tp = (time.time() - t0) / 20
    t0 = time.time()
    for _ in range(3):
        decode(f)
    td = (time.time() - t0) / 3
    # measured ~50x on this fixture; assert a conservative bound so the
    # 1-core CI host can't flake
    assert td / tp > 8, (tp, td)


def test_probe_bad_file_raises(tmp_path):
    from bliss_tpu.io import DecodeError, probe

    bad = tmp_path / "not_audio.flac"
    bad.write_bytes(b"this is not a flac file")
    with pytest.raises(DecodeError):
        probe(str(bad))


# --- native encoder (round 4) ------------------------------------------------


def _test_pcm(n_frames=22050 * 3, seed=3):
    rng = np.random.RandomState(seed)
    t = np.arange(n_frames)
    sig = 9000 * np.sin(2 * np.pi * t / 64.0) + rng.randn(n_frames) * 500
    left = np.clip(sig, -32768, 32767).astype(np.int16)
    right = np.clip(sig * 0.8, -32768, 32767).astype(np.int16)
    return np.stack([left, right], axis=1).reshape(-1)  # interleaved


def test_encode_flac_lossless_roundtrip(tmp_path):
    """Compressed FLAC written by the native encoder decodes bit-exactly
    (canonical s16/22.05kHz/stereo in == out)."""
    from bliss_tpu.io import decode, encode

    pcm = _test_pcm()
    p = str(tmp_path / "rt.flac")
    encode(p, pcm)
    # actually compressed, not verbatim (raw would be pcm.size * 2 bytes)
    assert os.path.getsize(p) < pcm.size * 2 * 0.9
    d = decode(p)
    assert d.resampled == 0
    np.testing.assert_array_equal(d.samples, pcm)


def test_encode_wav_lossless_roundtrip(tmp_path):
    from bliss_tpu.io import decode, encode

    pcm = _test_pcm()
    p = str(tmp_path / "rt.wav")
    encode(p, pcm)
    np.testing.assert_array_equal(decode(p).samples, pcm)


@pytest.mark.parametrize(
    "ext,codec", [("mp3", "libmp3lame"), ("ogg", "libvorbis")]
)
def test_encode_lossy_decodes_close(tmp_path, ext, codec):
    """Lossy encodes decode to the same length and correlate strongly with
    the source (they also exercise decode's non-FLAC demux paths, which the
    reference fixtures don't cover)."""
    from bliss_tpu.io import decode, encode

    pcm = _test_pcm()
    p = str(tmp_path / f"rt.{ext}")
    encode(p, pcm, codec=codec)
    d = decode(p)
    assert abs(d.n_samples - pcm.size) <= 4096 * 2  # codec edge padding
    n = min(d.n_samples, pcm.size)
    a = d.samples[:n].astype(np.float64)
    b = pcm[:n].astype(np.float64)
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.95, corr


def test_encode_analyze_pipeline(tmp_path):
    """An encoded mp3 flows through the full analysis pipeline: the
    per-codec e2e surface the synthetic FLAC library can't test."""
    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.io import encode
    from bliss_tpu.pipeline import analyze_library

    p = str(tmp_path / "song.mp3")
    encode(p, _test_pcm(), codec="libmp3lame")
    r = analyze_library([p], cfg=AnalysisConfig.for_parity(), batch_size=1)
    assert r.ok.all()
    assert np.isfinite(r.features).all()


def test_encode_error_paths(tmp_path):
    from bliss_tpu.io import EncodeError, encode

    with pytest.raises(EncodeError):
        encode(str(tmp_path / "x.notaformat"), _test_pcm())
    with pytest.raises(EncodeError):
        encode(str(tmp_path / "x.flac"), np.zeros(0, np.int16))
    with pytest.raises(EncodeError):  # odd length: not interleaved stereo
        encode(str(tmp_path / "y.flac"), np.zeros(3, np.int16))
    with pytest.raises(EncodeError):  # unknown codec override
        encode(str(tmp_path / "z.flac"), _test_pcm(), codec="nope")
