"""Unified text frontend: language segmentation + normalization + G2P.

Reference: gpt-sovits-mlx/src/text/{lang_segment,preprocessor}.rs and the
synthesize() call path (voice_clone.rs:740-780): text -> normalize -> lang
segments -> per-language G2P -> phoneme ids + word2ph.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

from ominix_mlx_tpu.text import en_g2p as en_mod
from ominix_mlx_tpu.text import zh_g2p as zh_mod
from ominix_mlx_tpu.text.normalizer import normalize_en, normalize_zh
from ominix_mlx_tpu.text.symbols import symbol_to_id

_RE_SPLIT = re.compile(r"([一-鿿]+)")


def segment_languages(text: str) -> List[Tuple[str, str]]:
    """Split into (lang, run) pieces: 'zh' for CJK runs, 'en' otherwise."""
    out = []
    for piece in _RE_SPLIT.split(text):
        if not piece:
            continue
        out.append(("zh" if _RE_SPLIT.fullmatch(piece) else "en", piece))
    return out


class TextFrontend:
    """Works OUT OF THE BOX from bundled assets (text/assets/: curated
    pinyin table covering the top-1500 hanzi + polyphone/neutral-tone word
    entries, full CMUdict 0.7b) — built by scripts/build_text_assets.py.
    assets_dir may add/override ``pinyin_dict.txt`` (word<TAB>pinyins) and
    ``cmudict.rep`` at runtime like the reference's g2pw model dir
    (g2pw.rs:81)."""

    def __init__(self, assets_dir: Optional[str] = None,
                 pinyin_table=None, cmu_table=None):
        pd_path = (os.path.join(assets_dir, "pinyin_dict.txt")
                   if assets_dir else None)
        cd_path = (os.path.join(assets_dir, "cmudict.rep")
                   if assets_dir else None)
        self.pinyin = zh_mod.PinyinDict(pd_path, pinyin_table)
        self.cmu = en_mod.CMUDict(cd_path, cmu_table)

    def g2p(self, text: str, lang: str = "auto"
            ) -> Tuple[List[str], List[int]]:
        """-> (phoneme symbols, word2ph). word2ph aligns phones to input
        characters for BERT feature expansion (zh only; en gets 1 per
        phone)."""
        phones: List[str] = []
        word2ph: List[int] = []
        has_zh = bool(_RE_SPLIT.search(text))
        if lang == "zh" or (lang == "auto" and has_zh):
            # digits inside Chinese context verbalize as Chinese BEFORE
            # language segmentation ("有3个" -> "有三个", not "three")
            text = normalize_zh(text)
        segs = (segment_languages(text) if lang == "auto"
                else [(lang, text)])
        for lg, run in segs:
            if lg == "zh":
                p, w2 = zh_mod.zh_g2p(run, self.pinyin)
                phones.extend(p)
                word2ph.extend(w2)
            else:
                p = en_mod.en_g2p(normalize_en(run), self.cmu)
                phones.extend(p)
                word2ph.extend([1] * len(p))
        return phones, word2ph

    def to_ids(self, phones: List[str]) -> List[int]:
        return [symbol_to_id(p) for p in phones]


def clean_text(text: str, lang: str = "auto",
               frontend: Optional[TextFrontend] = None
               ) -> Tuple[List[int], List[int]]:
    """One-call helper: text -> (phoneme ids, word2ph)."""
    fe = frontend or TextFrontend()
    phones, word2ph = fe.g2p(text, lang)
    return fe.to_ids(phones), word2ph
