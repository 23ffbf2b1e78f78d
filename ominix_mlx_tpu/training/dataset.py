"""VITS fine-tuning dataset: .list annotations -> static-shape batches.

Counterpart of reference gpt-sovits-mlx/src/training/{dataset.rs:1-375,
vits_dataset.rs:1-452}. The reference pads every batch to its longest
sample; on TPU that retraces per batch shape, so this loader instead crops
every sample to a FIXED spec-frame window (the standard vocoder-training
move): one compiled train step serves the whole run.

Per sample (GPT-SoVITS s2 semantics):
  wav         [crop*hop]    waveform at 32kHz
  spec        [crop, 1025]  |STFT| (n_fft 2048, hop 640 -> 50Hz frames)
  codes       [crop//2]     25Hz semantic ids (HuBERT feats -> k-means,
                            every other 50Hz frame; voice_clone.rs:398)
  text        [max_text]    phoneme ids via the zh/en frontend
  refer_spec  [ref_frames, 1025] same-speaker reference window
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class DatasetConfig:
    sample_rate: int = 32000
    n_fft: int = 2048
    hop: int = 640                  # 50Hz spec frames at 32kHz
    crop_frames: int = 100          # 2s windows
    max_text: int = 96
    ref_frames: int = 64
    hubert_rate: int = 16000


class VITSDataset:
    """Parses ``path|speaker|lang|text`` lines (audio/preprocess.py list
    format). ``codes_fn(wav_16k) -> [T50] int`` supplies semantic ids (wire
    the HuBERT+k-means quantizer there); defaults to zeros so shape-level
    training runs without a checkpoint."""

    def __init__(self, list_path: str, cfg: DatasetConfig = DatasetConfig(),
                 codes_fn=None, frontend=None):
        self.cfg = cfg
        self.codes_fn = codes_fn
        self.frontend = frontend
        self.items: List[dict] = []
        with open(list_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                path, speaker, lang, text = line.split("|", 3)
                self.items.append({"path": path, "speaker": speaker,
                                   "lang": lang, "text": text})

    def __len__(self) -> int:
        return len(self.items)

    # ------------------------------------------------------------ sample ----

    def _spec(self, wav: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from ominix_mlx_tpu.audio.dsp import stft
        s = np.abs(np.asarray(stft(jnp.asarray(wav, jnp.float32),
                                   n_fft=self.cfg.n_fft, hop=self.cfg.hop)))
        return s[:len(wav) // self.cfg.hop]

    def _text_ids(self, text: str, lang: str) -> np.ndarray:
        from ominix_mlx_tpu.text.frontend import clean_text
        ids, _ = clean_text(text, lang if lang in ("zh", "en") else "auto",
                            self.frontend)
        ids = ids[:self.cfg.max_text]
        return np.pad(np.asarray(ids, np.int32),
                      (0, self.cfg.max_text - len(ids)))

    def sample(self, i: int, rng: np.random.Generator) -> Optional[dict]:
        from ominix_mlx_tpu.audio import io as audio_io
        cfg = self.cfg
        it = self.items[i]
        wav, _ = audio_io.load_wav(it["path"], target_rate=cfg.sample_rate)
        wav = np.asarray(wav, np.float32)
        need = (cfg.crop_frames + 1) * cfg.hop
        if len(wav) < need:
            wav = np.pad(wav, (0, need - len(wav)))
        spec = self._spec(wav)
        # random aligned crop: spec frames, 25Hz codes, waveform samples
        start = int(rng.integers(0, spec.shape[0] - cfg.crop_frames + 1))
        start -= start % 2
        spec_c = spec[start:start + cfg.crop_frames]
        wav_c = wav[start * cfg.hop:(start + cfg.crop_frames) * cfg.hop]
        if self.codes_fn is not None:
            from ominix_mlx_tpu.audio.io import resample
            wav16 = resample(wav, cfg.sample_rate, cfg.hubert_rate)
            codes50 = np.asarray(self.codes_fn(wav16), np.int32)
            codes50 = np.pad(codes50,
                             (0, max(0, spec.shape[0] - len(codes50))))
            codes = codes50[start:start + cfg.crop_frames:2]
        else:
            codes = np.zeros((cfg.crop_frames // 2,), np.int32)
        ref = spec[:cfg.ref_frames]
        if ref.shape[0] < cfg.ref_frames:
            ref = np.pad(ref, ((0, cfg.ref_frames - ref.shape[0]), (0, 0)))
        return {"codes": codes, "text": self._text_ids(it["text"], it["lang"]),
                "spec": spec_c, "refer_spec": ref, "wav": wav_c}

    # ------------------------------------------------------------ batches ---

    def batches(self, batch_size: int, seed: int = 0, drop_last: bool = True):
        """Yield static-shape dict batches (stacked numpy arrays)."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.items))
        buf = []
        for i in order:
            s = self.sample(int(i), rng)
            if s is not None:
                buf.append(s)
            if len(buf) == batch_size:
                yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
                buf = []
        if buf and not drop_last:
            yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
