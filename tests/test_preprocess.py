"""GPT-SoVITS preprocessing tools: slicer silence detection, spectral
subtraction denoise, and the slice->denoise->label pipeline + list format."""

import numpy as np

from ominix_mlx_tpu.audio.preprocess import (DenoiseConfig, PreprocessPipeline,
                                             Slicer, SlicerConfig, denoise)

SR = 16000


def _tone(dur_s, freq=440.0, amp=0.5):
    t = np.arange(int(dur_s * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _silence(dur_s):
    return np.zeros(int(dur_s * SR), np.float32)


def test_rms_of_sine():
    s = Slicer(SlicerConfig(sample_rate=SR, hop_size_ms=10))
    rms = s._rms(_tone(1.0))
    assert 0.3 < float(rms.mean()) < 0.4          # 0.5/sqrt(2) ~ 0.354


def test_short_audio_single_chunk():
    s = Slicer(SlicerConfig(sample_rate=SR, min_length_ms=1000))
    chunks = s.slice(_silence(0.5))
    assert len(chunks) == 1 and len(chunks[0][0]) == SR // 2


def test_slices_on_silence():
    cfg = SlicerConfig(sample_rate=SR, min_length_ms=1000,
                       min_interval_ms=300, max_sil_kept_ms=200)
    s = Slicer(cfg)
    audio = np.concatenate([_tone(1.5), _silence(0.8), _tone(1.5),
                            _silence(0.8), _tone(1.5)])
    chunks = s.slice(audio)
    assert len(chunks) == 3, [(c[1], c[2]) for c in chunks]
    # chunks ordered, non-overlapping, inside the original timeline
    for (_, a0, a1), (_, b0, b1) in zip(chunks, chunks[1:]):
        assert a0 < a1 <= b0 < b1
    # each chunk contains its tone (roughly 1.5s of signal)
    for c, _, _ in chunks:
        assert np.abs(c).max() > 0.4 and len(c) >= int(1.2 * SR)


def test_normalize_alpha_mix():
    cfg = SlicerConfig(max_amplitude=0.9, alpha=0.25)
    s = Slicer(cfg)
    x = np.asarray([2.0, -2.0, 1.0], np.float32)
    y = s.normalize(x)
    # peak scaled to 1 first, then alpha mix: y = x/m*0.225 + 0.75*x/m... all
    # finite and bounded by max_amplitude mix
    assert np.all(np.isfinite(y)) and np.abs(y).max() <= 1.0


def test_denoise_improves_snr():
    # leading noise-only segment: the algorithm estimates the noise profile
    # from the first frames (denoise.rs noise_frames semantics)
    rng = np.random.default_rng(0)
    lead = int(0.3 * SR)
    tone = _tone(2.0, freq=500.0, amp=0.5)
    clean = np.concatenate([np.zeros(lead, np.float32), tone])
    noise = rng.normal(0, 0.05, len(clean)).astype(np.float32)
    noisy = clean + noise
    cfg = DenoiseConfig(sample_rate=SR, n_fft=1024, hop_length=256,
                        noise_frames=8, over_subtraction=1.5)
    out = denoise(noisy, cfg)
    assert out.shape == noisy.shape

    def snr(x):                              # on the tone region only
        err = x[lead:] - tone
        return 10 * np.log10(np.sum(tone ** 2) / max(np.sum(err ** 2), 1e-9))

    assert snr(out) > snr(noisy) + 3.0, (snr(out), snr(noisy))


def test_pipeline_end_to_end(tmp_path):
    from ominix_mlx_tpu.audio import io as audio_io
    wav = tmp_path / "take1.wav"
    audio = np.concatenate([_tone(1.2), _silence(0.7), _tone(1.2)])
    audio_io.save_wav(str(wav), audio, SR)

    class FakeASR:
        def transcribe(self, samples, rate):
            return f"len{len(samples) // rate}"

    cfg = SlicerConfig(sample_rate=SR, min_length_ms=800,
                       min_interval_ms=300, max_sil_kept_ms=200)
    pipe = PreprocessPipeline(transcriber=FakeASR(), slicer=Slicer(cfg),
                              enable_denoise=True, language="en",
                              denoise_config=DenoiseConfig(
                                  sample_rate=SR, n_fft=512, hop_length=128),
                              speaker="spk1")
    results = pipe.process_directory(str(tmp_path), str(tmp_path / "out"))
    assert len(results) >= 2
    lst = tmp_path / "train.list"
    pipe.write_transcript_list(results, str(lst))
    lines = lst.read_text().strip().splitlines()
    assert len(lines) == len(results)
    for ln in lines:
        path, spk, lang, text = ln.split("|")
        assert path.endswith(".wav") and spk == "spk1" and lang == "en"
        assert text.startswith("len")
