"""Pins for polyphase windowed-sinc resampling and the resample_media
operator: byte-exact vs a per-output-sample reference over a rate-pair
grid, spectral invariants by FFT (tone preservation, alias rejection,
DC exactness), determinism, and the Spark plumbing contract."""

from __future__ import annotations

import numpy as np
import pytest

from streamsum_spark.operators import multimodal as mm
from streamsum_spark.operators.audio_prep import (
    downmix_mono,
    resample_audio,
    resample_media,
)


def _ref_resample(samples, in_rate, out_rate, n_zeros=16):
    """Per-output-sample definition (no polyphase sharing): the spec the
    polyphase implementation must match byte-for-byte."""
    a = samples.astype(np.float64)
    in_len = a.shape[0]
    ratio = in_rate / out_rate
    s = max(1.0, ratio)
    support = n_zeros * s
    ksize = 2 * int(np.ceil(support)) + 1
    out_len = int(np.floor((in_len - 1) / ratio)) + 1
    centers = np.arange(out_len, dtype=np.float64) * ratio
    left = np.ceil(centers - support).astype(np.int64)
    idx = left[:, None] + np.arange(ksize)[None, :]
    x = (idx - centers[:, None]) / s
    w = np.sinc(x) * (0.5 + 0.5 * np.cos(np.pi * np.clip(x / n_zeros, -1, 1)))
    w = np.where((idx >= 0) & (idx < in_len), w, 0.0)
    idx = np.clip(idx, 0, in_len - 1)
    w = w / w.sum(axis=1, keepdims=True)
    out = np.zeros((out_len,) + a.shape[1:], dtype=np.float64)
    wshape = (-1,) + (1,) * (a.ndim - 1)
    for k in range(ksize):
        out += w[:, k].reshape(wshape) * a[idx[:, k]]
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


def _tone(freq, rate, sec=0.5, amp=12000.0):
    t = np.arange(int(rate * sec)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16).reshape(-1, 1)


def _peak_freq(x, rate):
    sp = np.abs(np.fft.rfft(x[:, 0].astype(np.float64) * np.hanning(len(x))))
    return float(np.fft.rfftfreq(len(x), 1 / rate)[np.argmax(sp)])


def _band_db(x, rate, f, bw=60.0):
    n = len(x)
    sp = np.abs(np.fft.rfft(x[:, 0].astype(np.float64) * np.hanning(n))) / n
    fr = np.fft.rfftfreq(n, 1 / rate)
    m = (fr > f - bw) & (fr < f + bw)
    return float(20 * np.log10(sp[m].max() + 1e-12))


RATE_PAIRS = [
    (48000, 16000),   # integer downsample
    (44100, 16000),   # 441:160 polyphase
    (8000, 44100),    # deep upsample
    (22050, 16000),   # 441:320
    (11025, 48000),   # odd up
    (16000, 8000),
]


def test_polyphase_matches_per_output_reference_byte_exact():
    rng = np.random.default_rng(3)
    for ir, orr in RATE_PAIRS:
        x = rng.integers(-20000, 20000, (4801, 2)).astype(np.int16)
        got = resample_audio(x, ir, orr)
        want = _ref_resample(x, ir, orr)
        assert got.shape == want.shape and np.array_equal(got, want), (ir, orr)


def test_identity_rate_and_dc_exact():
    rng = np.random.default_rng(5)
    x = rng.integers(-32768, 32767, (1000, 2)).astype(np.int16)
    same = resample_audio(x, 16000, 16000)
    assert np.array_equal(same, x) and same is not x
    dc = np.full((48000, 2), 1234, np.int16)
    out = resample_audio(dc, 48000, 16000)
    assert np.array_equal(out, np.full((len(out), 2), 1234, np.int16))


def test_tone_frequency_and_amplitude_preserved():
    t = _tone(440.0, 48000)
    down = resample_audio(t, 48000, 16000)
    assert len(down) == (len(t) - 1) // 3 + 1
    assert abs(_peak_freq(down, 16000) - 440.0) < 2.0
    assert abs(int(np.abs(down).max()) - 12000) <= 60  # <0.5% passband droop
    up = resample_audio(_tone(440.0, 8000), 8000, 44100)
    assert abs(_peak_freq(up, 44100) - 440.0) < 2.0


def test_out_of_band_energy_filtered_not_folded():
    """A 13 kHz tone downsampled 48k->16k would alias to 3 kHz with a
    naive decimator; the sinc's dilated cutoff must suppress it ~80 dB
    below a passband tone instead."""
    passband = resample_audio(_tone(1000.0, 48000), 48000, 16000)
    folded = resample_audio(_tone(13000.0, 48000), 48000, 16000)
    assert _band_db(passband, 16000, 1000.0) - _band_db(folded, 16000, 3000.0) > 75.0


def test_determinism_and_empty_and_errors():
    t = _tone(440.0, 44100)
    assert np.array_equal(resample_audio(t, 44100, 16000), resample_audio(t, 44100, 16000))
    empty = np.zeros((0, 2), np.int16)
    assert resample_audio(empty, 48000, 16000).shape == (0, 2)
    with pytest.raises(ValueError):
        resample_audio(t, 0, 16000)
    with pytest.raises(ValueError):
        resample_audio(t, 16000, -1)


def test_downmix_mono():
    x = np.array([[100, 200], [-5, -6], [32767, 32767]], np.int16)
    got = downmix_mono(x)
    assert np.array_equal(got, np.array([[150], [-6], [32767]], np.int16))
    m = np.array([[7], [8]], np.int16)
    assert np.array_equal(downmix_mono(m), m)
    with pytest.raises(ValueError):
        downmix_mono(np.zeros(4, np.int16))


def test_resample_media_plumbing(spark):
    """Spark contract: schema, per-row isolation, and the output WAV
    decoding byte-exactly to downmix+resample of the decoded source."""
    rng = np.random.default_rng(11)
    stereo = rng.integers(-15000, 15000, (4800, 2)).astype(np.int16)
    monob = rng.integers(-15000, 15000, (2205, 1)).astype(np.int16)
    rows = [
        (1, bytearray(mm.encode_wav(stereo, 48000))),
        (2, bytearray(mm.encode_aiff(monob, 22050))),
        (3, bytearray(b"RIFFxxxxWAVEgarbage")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary").repartition(3)
    out = {r.media_id: r for r in resample_media(media, out_rate=16000).collect()}
    assert set(out) == {1, 2, 3, 4}
    r1 = out[1]
    assert r1.decoded and r1.src_rate == 48000 and r1.src_channels == 2
    assert r1.rate == 16000 and r1.channels == 1
    got, rate = mm.decode_audio(bytes(r1.content))
    assert rate == 16000
    want = resample_audio(downmix_mono(stereo), 48000, 16000)
    assert np.array_equal(got, want)
    assert r1.duration_ms == len(want) * 1000 // 16000
    r2 = out[2]
    assert r2.decoded and r2.src_rate == 22050 and r2.src_channels == 1
    got2, _ = mm.decode_audio(bytes(r2.content))
    assert np.array_equal(got2, resample_audio(monob, 22050, 16000))
    for mid in (3, 4):
        assert not out[mid].decoded and out[mid].content is None
    with pytest.raises(ValueError):
        resample_media(media, out_rate=0)


def test_log_mel_matches_naive_dft_reference():
    """The whole front end (framing, Hann window, rfft power, filterbank
    projection, log floor) against an O(n^2) DFT computed from the
    definitions — agreement to float64 roundoff."""
    from streamsum_spark.operators.audio_prep import (
        log_mel_spectrogram,
        mel_filterbank,
    )

    rng = np.random.default_rng(2)
    s = rng.integers(-8000, 8000, (64, 1)).astype(np.int16)
    got = log_mel_spectrogram(s, 8000, n_fft=32, hop=16, n_mels=8)
    x = s.astype(np.float64)[:, 0] / 32768.0
    win = np.hanning(32)
    fb = mel_filterbank(8, 32, 8000)
    ref = []
    for f0 in range(0, 64 - 32 + 1, 16):
        fr = x[f0 : f0 + 32] * win
        spec = np.array(
            [
                sum(fr[t] * np.exp(-2j * np.pi * k * t / 32) for t in range(32))
                for k in range(17)
            ]
        )
        ref.append(np.log10(np.maximum(np.abs(spec) ** 2 @ fb.T, 1e-10)))
    assert np.abs(got - np.array(ref)).max() < 1e-9


def test_mel_tone_lands_in_expected_bin_and_frame_count():
    from streamsum_spark.operators.audio_prep import (
        log_mel_spectrogram,
        mel_filterbank,
    )

    rate = 16000
    t = np.arange(rate) / rate
    tone = (12000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16).reshape(-1, 1)
    m = log_mel_spectrogram(tone, rate)
    assert m.shape == (1 + (rate - 400) // 160, 80)
    fb = mel_filterbank(80, 400, rate)
    freqs = np.fft.rfftfreq(400, 1 / rate)
    expect = int(np.argmax(fb[:, np.argmin(np.abs(freqs - 1000))]))
    assert int(np.argmax(m.mean(axis=0))) == expect
    # short input -> zero complete frames, not an error
    assert log_mel_spectrogram(tone[:399], rate).shape == (0, 80)


def test_mel_filterbank_shape_and_coverage():
    from streamsum_spark.operators.audio_prep import mel_filterbank

    fb = mel_filterbank(40, 512, 16000)
    assert fb.shape == (40, 257) and (fb >= 0).all()
    assert (fb.max(axis=1) > 0).all()  # every filter hears something
    # mid-spectrum bins are covered by at least one filter
    covered = fb.sum(axis=0) > 0
    assert covered[5:250].all()


def test_mel_features_media_plumbing(spark):
    from streamsum_spark.operators.audio_prep import (
        log_mel_spectrogram,
        mel_features_media,
    )

    rng = np.random.default_rng(13)
    stereo = rng.integers(-15000, 15000, (48000, 2)).astype(np.int16)
    rows = [
        (1, bytearray(mm.encode_wav(stereo, 48000))),
        (2, bytearray(b"junk")),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in mel_features_media(media).collect()}
    r1 = out[1]
    assert r1.decoded and r1.src_rate == 48000 and r1.n_mels == 80
    want = log_mel_spectrogram(
        resample_audio(downmix_mono(stereo), 48000, 16000), 16000
    ).astype(np.float32)
    assert r1.n_frames == want.shape[0]
    got = np.array(r1.mel, dtype=np.float32).reshape(r1.n_frames, r1.n_mels)
    assert np.allclose(got, want, atol=1e-5)
    assert not out[2].decoded and out[2].mel is None


def test_mfcc_matches_definition_and_orthonormality():
    from streamsum_spark.operators.audio_prep import log_mel_spectrogram, mfcc

    rng = np.random.default_rng(3)
    mel = rng.normal(size=(7, 12))
    got = mfcc(mel, n_coef=5)
    # explicit DCT-II definition, per coefficient
    for f in range(7):
        for k in range(5):
            scale = np.sqrt(1.0 / 12) if k == 0 else np.sqrt(2.0 / 12)
            want = scale * sum(
                mel[f, m] * np.cos(np.pi * k * (2 * m + 1) / 24) for m in range(12)
            )
            assert abs(got[f, k] - want) < 1e-12
    # full-size basis is orthonormal: transform then inverse recovers mel
    full = mfcc(mel, n_coef=12)
    k = np.arange(12)[:, None]
    m = np.arange(12)[None, :]
    basis = np.cos(np.pi * k * (2 * m + 1) / 24) * np.sqrt(2.0 / 12)
    basis[0] *= np.sqrt(0.5)
    assert np.allclose(full @ basis, mel, atol=1e-12)
    with pytest.raises(ValueError):
        mfcc(mel, n_coef=0)
    with pytest.raises(ValueError):
        mfcc(mel[0], n_coef=3)


def test_energy_vad_and_trim_silence():
    from streamsum_spark.operators.audio_prep import energy_vad, trim_silence

    rate = 16000
    sil = np.zeros((rate // 2, 1), np.int16)
    t = np.arange(rate) / rate
    speech = (9000 * np.sin(2 * np.pi * 300 * t)).astype(np.int16).reshape(-1, 1)
    x = np.vstack([sil, speech, sil])
    mask = energy_vad(x, rate)
    n_fft, hop = 400, 160
    assert mask.shape == (1 + (len(x) - n_fft) // hop,)
    # frames fully inside the silence are inactive; fully inside speech active
    assert not mask[: (len(sil) - n_fft) // hop - 1].any()
    mid = (len(sil) + n_fft) // hop + 1
    assert mask[mid : mid + 20].all()
    trimmed = trim_silence(x, rate)
    # the trim keeps the speech span within one hop+frame of its bounds
    assert abs(len(trimmed) - len(speech)) <= n_fft + 2 * hop
    assert np.abs(trimmed.astype(int)).max() == 9000
    # all-silence -> empty; all-speech -> identity-length
    assert trim_silence(sil, rate).shape == (0, 1)
    full = trim_silence(speech, rate)
    assert len(speech) - len(full) <= n_fft
    # mask indexes mel rows directly (same frame layout)
    from streamsum_spark.operators.audio_prep import log_mel_spectrogram

    assert len(log_mel_spectrogram(x, rate)) == len(mask)


# --- windowing ----------------------------------------------------------------


def test_audio_window_plan(spark):
    from streamsum_spark.operators.audio_prep import audio_window_plan

    media = spark.createDataFrame(
        [(1, 67_000), (2, 10_000), (3, None)],
        "media_id long, duration_ms long",
    )
    plan = audio_window_plan(media, window_ms=30_000, hop_ms=25_000)
    got = {(r.media_id, r.win_idx): (r.start_ms, r.end_ms) for r in plan.collect()}
    # 67 s: starts 0/25/50 -> ends 30/55/67 (tail clamps)
    assert got[(1, 0)] == (0, 30_000)
    assert got[(1, 1)] == (25_000, 55_000)
    assert got[(1, 2)] == (50_000, 67_000)
    assert got[(2, 0)] == (0, 10_000)
    assert (2, 1) not in got
    assert not any(m == 3 for m, _ in got)  # null duration excluded


def test_extract_audio_windows_roundtrip(spark):
    import numpy as np

    from streamsum_spark.operators.audio_prep import (
        downmix_mono,
        extract_audio_windows,
        resample_audio,
    )
    from streamsum_spark.operators.multimodal import decode_audio, encode_wav

    rate = 16000
    t = np.arange(rate * 4)  # 4 s
    tone = (np.sin(t * 0.07) * 9000).astype(np.int16).reshape(-1, 1)
    blob = encode_wav(tone, rate)
    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not audio"))],
        "media_id long, content binary",
    )
    out = extract_audio_windows(
        media, window_ms=2000, hop_ms=1500, out_rate=8000
    ).collect()
    rows = {(r.media_id, r.win_idx): r for r in out}
    # 4 s @ win 2 s hop 1.5 s -> starts 0 / 1.5 / 3.0 (last reaches end)
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert (rows[(1, 0)].start_ms, rows[(1, 0)].end_ms) == (0, 2000)
    assert (rows[(1, 2)].start_ms, rows[(1, 2)].end_ms) == (3000, 4000)
    # windows concatenated at hop boundaries == the resampled original
    ref = resample_audio(downmix_mono(tone), rate, 8000)
    w0, r0 = decode_audio(rows[(1, 0)].content)
    assert r0 == 8000
    hop = 1500 * 8000 // 1000
    pieces = [decode_audio(rows[(1, i)].content)[0][: hop if i < 2 else None]
              for i in range(3)]
    # window i covers [i*hop, i*hop + win): the first hop samples of
    # each window plus the full final window reassemble the stream
    recon = np.concatenate([pieces[0], pieces[1], decode_audio(rows[(1, 2)].content)[0]])
    assert (recon == ref).all()
    # error isolation: one decoded=false row for the bad blob
    assert not rows[(2, 0)].decoded and rows[(2, 0)].content is None


def test_zero_duration_rows_cannot_fail_the_plan(spark):
    # sequence(0, -1, step) throws in Spark: one truncated clip must
    # not kill the job (same guard in frame_sample_plan)
    from streamsum_spark.operators.audio_prep import audio_window_plan
    from streamsum_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [(1, 0), (2, 3000), (3, None)], "media_id long, duration_ms long"
    )
    assert {r.media_id for r in audio_window_plan(media).collect()} == {2}
    assert {r.media_id for r in frame_sample_plan(media).collect()} == {2}


def test_plan_matches_extractor_stop_rule(spark):
    """ADVICE r11: duration 80 s, window 30 s, hop 25 s — the extractor
    emits starts {0, 25, 50} (window at 50 reaches 80); the plan must
    not emit a dangling start at 75.  Joined on (media_id, win_idx),
    plan and extraction cover the same keys."""
    import numpy as np

    from streamsum_spark.operators.audio_prep import (
        audio_window_plan,
        extract_audio_windows,
    )
    from streamsum_spark.operators.multimodal import encode_wav

    rate = 8000
    media_p = spark.createDataFrame(
        [(1, 80_000)], "media_id long, duration_ms long"
    )
    plan = audio_window_plan(media_p, window_ms=30_000, hop_ms=25_000)
    plan_keys = {(r.media_id, r.win_idx) for r in plan.collect()}
    assert plan_keys == {(1, 0), (1, 1), (1, 2)}

    tone = (np.sin(np.arange(rate * 80) * 0.05) * 8000).astype(
        np.int16
    ).reshape(-1, 1)
    media_b = spark.createDataFrame(
        [(1, bytearray(encode_wav(tone, rate)))],
        "media_id long, content binary",
    )
    got = extract_audio_windows(
        media_b, window_ms=30_000, hop_ms=25_000, out_rate=8000
    )
    got_keys = {(r.media_id, r.win_idx) for r in got.collect()}
    assert got_keys == plan_keys
    # exact-cover case too: duration a multiple of hop with window==hop
    media_e = spark.createDataFrame(
        [(7, 60_000)], "media_id long, duration_ms long"
    )
    p2 = audio_window_plan(media_e, window_ms=30_000, hop_ms=30_000)
    assert {(r.win_idx, r.start_ms, r.end_ms) for r in p2.collect()} == {
        (0, 0, 30_000), (1, 30_000, 60_000)
    }


def test_null_content_emits_decode_failure_row(spark):
    from streamsum_spark.operators.audio_prep import extract_audio_windows

    media = spark.createDataFrame(
        [(1, None)], "media_id long, content binary"
    )
    rows = extract_audio_windows(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.media_id == 1 and not r.decoded and r.content is None
