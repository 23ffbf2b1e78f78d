"""English G2P: CMUdict lookup (runtime asset) with a rule-based
letter-to-phone fallback.

Reference behaviors: gpt-sovits-mlx/src/text/{cmudict,g2p_en,
g2p_en_enhanced}.rs. The dictionary file (cmudict format: ``WORD  P1 P2``)
loads from the model/assets dir at runtime like other data assets.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional


BUNDLED_DICT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "assets", "cmudict.txt.gz")


class CMUDict:
    """Bundled compact CMUdict 0.7b (assets/cmudict.txt.gz, built by
    scripts/build_text_assets.py; BSD license in assets/CMUDICT_LICENSE),
    optionally extended by a runtime cmudict-format file."""

    def __init__(self, path: Optional[str] = None,
                 table: Optional[Dict[str, List[str]]] = None,
                 bundled: bool = True):
        self.table: Dict[str, List[str]] = {}
        if bundled and os.path.exists(BUNDLED_DICT):
            import gzip
            with gzip.open(BUNDLED_DICT, "rt", encoding="utf-8") as f:
                for ln in f:
                    w, _, pron = ln.rstrip("\n").partition("\t")
                    if pron:
                        self.table[w.upper()] = pron.split()
        if path and os.path.exists(path):
            with open(path, encoding="latin-1") as f:
                for ln in f:
                    if not ln or ln.startswith(";;;"):
                        continue
                    parts = ln.split()
                    if len(parts) >= 2:
                        w = parts[0]
                        if "(" in w:      # alternate pronunciations
                            continue
                        self.table[w.upper()] = parts[1:]
        self.table.update(table or {})

    def lookup(self, word: str) -> Optional[List[str]]:
        return self.table.get(word.upper())


# letter-to-phone fallback: rough grapheme rules so out-of-dictionary words
# degrade gracefully instead of failing (reference falls back similarly)
_LETTER_PHONES = {
    "a": ["AE1"], "b": ["B"], "c": ["K"], "d": ["D"], "e": ["EH1"],
    "f": ["F"], "g": ["G"], "h": ["HH"], "i": ["IH1"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "o": ["AA1"],
    "p": ["P"], "q": ["K"], "r": ["R"], "s": ["S"], "t": ["T"],
    "u": ["AH1"], "v": ["V"], "w": ["W"], "x": ["K", "S"], "y": ["Y"],
    "z": ["Z"],
}
_DIGRAPHS = {
    "ch": ["CH"], "sh": ["SH"], "th": ["TH"], "ph": ["F"], "wh": ["W"],
    "ck": ["K"], "ng": ["NG"], "qu": ["K", "W"], "ee": ["IY1"],
    "oo": ["UW1"], "ea": ["IY1"], "ou": ["AW1"], "ai": ["EY1"],
    "ay": ["EY1"], "oi": ["OY1"], "ow": ["OW1"],
}


def letter_g2p(word: str) -> List[str]:
    word = word.lower()
    out: List[str] = []
    i = 0
    while i < len(word):
        if word[i:i + 2] in _DIGRAPHS:
            out.extend(_DIGRAPHS[word[i:i + 2]])
            i += 2
        elif word[i] in _LETTER_PHONES:
            # final silent e
            if (word[i] == "e" and i == len(word) - 1 and len(word) > 2):
                i += 1
                continue
            out.extend(_LETTER_PHONES[word[i]])
            i += 1
        else:
            i += 1
    return out


_RE_WORD = re.compile(r"[A-Za-z']+|[,.!?…-]")


def en_g2p(text: str, cmu: Optional[CMUDict] = None) -> List[str]:
    phones: List[str] = []
    for tok in _RE_WORD.findall(text):
        if not tok[0].isalpha():
            phones.append(tok)
            continue
        pron = cmu.lookup(tok) if cmu else None
        phones.extend(pron if pron else letter_g2p(tok))
    return phones
