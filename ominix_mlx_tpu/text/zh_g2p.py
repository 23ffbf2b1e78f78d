"""Mandarin G2P: jieba segmentation + pinyin dictionary + tone sandhi +
erhua, emitting (initial, final+tone) phoneme pairs.

Reference behaviors: gpt-sovits-mlx/src/text/{jieba_seg,g2pw,tone_sandhi,
erhua}.rs. The char/word -> pinyin table is a runtime asset (like the
reference's g2pW model dir); jieba itself is the baked-in python package.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

_INITIALS = ["zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l",
             "g", "k", "h", "j", "q", "x", "r", "z", "c", "s", "y", "w"]

# pinyin-final respellings used by the symbol table (pypinyin Style.TONE3
# finals to GPT-SoVITS symbol finals)
_FINAL_FIX = {
    "ui": "uei", "iu": "iou", "un": "uen", "ue": "ve",
}


_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")
BUNDLED_TABLE = os.path.join(_ASSETS, "pinyin_base.txt")
POLYPHONE_TABLE = os.path.join(_ASSETS, "polyphone_words.txt")


class PinyinDict:
    """word/char -> pinyin list: the BUNDLED hand-curated table
    (assets/pinyin_base.txt: top-frequency chars + polyphone word entries
    + neutral-tone words; see scripts/build_text_assets.py --coverage)
    optionally extended/overridden by a runtime asset of the same format
    (``word<TAB>py1 py2 ...`` with tone digits, ni3 hao3)."""

    def __init__(self, path: Optional[str] = None,
                 table: Optional[Dict[str, List[str]]] = None,
                 bundled: bool = True):
        self.table: Dict[str, List[str]] = {}
        paths = ([BUNDLED_TABLE, POLYPHONE_TABLE] if bundled else []) \
            + ([path] if path else [])
        for pth in paths:
            if not os.path.exists(pth):
                continue
            with open(pth, encoding="utf-8") as f:
                for ln in f:
                    if ln.startswith("#"):
                        continue
                    parts = ln.rstrip("\n").split("\t")
                    if len(parts) == 2:
                        self.table[parts[0]] = parts[1].split()
        self.table.update(table or {})

    def lookup(self, word: str) -> Optional[List[str]]:
        if word in self.table:
            return self.table[word]
        # char-by-char fallback
        out = []
        for ch in word:
            py = self.table.get(ch)
            if not py:
                return None
            out.append(py[0])
        return out if out else None

    def lookup_lenient(self, word: str) -> List[str]:
        """lookup() that never fails: greedy longest-submatch against the
        table (jieba emits long idiom/compound tokens like 的确如此 or
        首都机场 that miss whole-word entries — the polyphone words INSIDE
        them must still resolve), then per-char default, then the neutral
        filler 'a5' for unknown hanzi (a whole-word wipeout on one rare
        char would corrupt cloned speech far more than one filler
        syllable)."""
        if word in self.table:
            return self.table[word]
        out: List[str] = []
        i, n = 0, len(word)
        while i < n:
            for ln in range(min(4, n - i), 1, -1):
                sub = self.table.get(word[i:i + ln])
                if sub is not None:
                    out.extend(sub)
                    i += ln
                    break
            else:
                out.append((self.table.get(word[i]) or ["a5"])[0])
                i += 1
        return out


def split_pinyin(py: str) -> Tuple[str, str]:
    """'zhong1' -> ('zh', 'ong1'). Tone defaults to 5 (neutral)."""
    tone = "5"
    if py and py[-1].isdigit():
        tone = py[-1]
        py = py[:-1]
    initial = ""
    for ini in _INITIALS:
        if py.startswith(ini):
            initial = ini
            py = py[len(ini):]
            break
    if initial in ("j", "q", "x", "y") and py.startswith("u"):
        py = "v" + py[1:]   # ü is spelled u after j/q/x/y: ju -> j v,
        #                     jun -> j vn, juan -> j van, yue -> y ve
    py = _FINAL_FIX.get(py, py)
    if py == "i":        # syllabic consonants: zi/ci/si -> ii, zhi -> iii
        if initial in ("z", "c", "s"):
            py = "ii"
        elif initial in ("zh", "ch", "sh", "r"):
            py = "iii"
    return initial, py + tone


# -------------------------------------------------------------- sandhi ------

def _tone(py: str) -> str:
    return py[-1] if py and py[-1].isdigit() else "5"


def _with_tone(py: str, tone: str) -> str:
    return (py[:-1] if py and py[-1].isdigit() else py) + tone


def tone_sandhi(words: List[Tuple[str, List[str]]]
                ) -> List[Tuple[str, List[str]]]:
    """Apply Mandarin tone sandhi per segmented word (reference:
    tone_sandhi.rs; rules are the standard published ones):
      - third-tone sandhi: 3 3 -> 2 3 inside a word AND across adjacent
        words (last syllable of word i before a 3-initial word i+1)
      - 不 (bu4): -> bu2 before tone 4; NEUTRAL (bu5) inside X不X
        reduplication (好不好) and V一V-style tags
      - 一 (yi1): -> yi4 before tones 1/2/3, yi2 before tone 4; NEUTRAL
        (yi5) inside V一V reduplication (看一看); yi1 kept for
        ordinals/counting (第一, 一九九七)
    """
    out = []
    flat: List[str] = [py for _, pys in words for py in pys]
    flat_chars = [ch for w, _ in words for ch in w]
    gi = 0
    for w, pys in words:
        pys = list(pys)
        for i, ch in enumerate(w):
            g = gi + i
            nxt = flat[g + 1] if g + 1 < len(flat) else None
            prev_ch = flat_chars[g - 1] if g > 0 else ""
            nxt_ch = flat_chars[g + 1] if g + 1 < len(flat_chars) else ""
            if ch == "不":
                if prev_ch and prev_ch == nxt_ch:
                    pys[i] = _with_tone(pys[i], "5")   # 好不好 / 是不是
                elif nxt is not None and _tone(nxt) == "4":
                    pys[i] = _with_tone(pys[i], "2")
            elif ch == "一":
                if prev_ch.isdigit() or nxt_ch.isdigit() \
                        or prev_ch == "第" or prev_ch == "一" \
                        or nxt_ch == "一":
                    pass                      # ordinal/counting: keep yi1
                elif prev_ch and prev_ch == nxt_ch:
                    pys[i] = _with_tone(pys[i], "5")   # 看一看 / 等一等
                elif nxt is not None and _tone(nxt) == "4":
                    pys[i] = _with_tone(pys[i], "2")
                elif nxt is not None and _tone(nxt) in ("1", "2", "3"):
                    pys[i] = _with_tone(pys[i], "4")
        # third-tone sandhi within the word (right-to-left)
        for i in range(len(pys) - 2, -1, -1):
            if _tone(pys[i]) == "3" and _tone(pys[i + 1]) == "3":
                pys[i] = _with_tone(pys[i], "2")
        out.append((w, pys))
        gi += len(w)
    # cross-word third-tone sandhi: ... w_i[-1]=3 | w_{i+1}[0]=3 ...
    for i in range(len(out) - 1):
        a, b = out[i][1], out[i + 1][1]
        if a and b and _tone(a[-1]) == "3" and _tone(b[0]) == "3":
            a[-1] = _with_tone(a[-1], "2")
    return out


def apply_erhua(word: str, pys: List[str]) -> Tuple[str, List[str]]:
    """Merge trailing 儿 (er) into the previous syllable's final
    (reference: erhua.rs). Whitelisted words like 儿子 keep the syllable."""
    keep = {"儿子", "儿童", "女儿", "婴儿", "幼儿", "孤儿"}
    if (len(word) >= 2 and word.endswith("儿") and word not in keep
            and len(pys) == len(word)):
        base = pys[-2]
        tone = _tone(base)
        merged = _with_tone(base, "") .rstrip("12345")
        pys = pys[:-2] + [merged + "r" + tone]
        word = word[:-1]
    return word, pys


# ---------------------------------------------------------------- main ------

_RE_ZH = re.compile(r"[一-鿿]+")


def _segment(text: str, pdict: PinyinDict, sandhi: bool = True
             ) -> List[Tuple[str, List[str]]]:
    """jieba POS-tagged cut -> per-word pinyin lookup -> polyphone context
    rules (text/polyphone.py) -> tone sandhi. Shared front half of zh_g2p;
    also drives the polyphone eval
    (tests/assets/zh_polyphone_golden.tsv)."""
    import jieba.posseg as pseg

    from ominix_mlx_tpu.text.polyphone import apply_polyphone_rules

    toks: List[list] = []
    for p in pseg.cut(text):
        if _RE_ZH.fullmatch(p.word):
            toks.append([p.word, pdict.lookup_lenient(p.word), p.flag])
        else:
            toks.append([p.word, [], p.flag])
    words = apply_polyphone_rules(toks, pdict)
    zh_words = [(w, p) for w, p in words if p]
    if sandhi:
        zh_words = tone_sandhi(zh_words)
    it = iter(zh_words)
    return [(next(it) if p else (w, p)) for w, p in words]


def per_char_pinyin(text: str, pdict: PinyinDict, sandhi: bool = False
                    ) -> List[Tuple[str, str]]:
    """(hanzi, pinyin-with-tone) for every Chinese char of ``text``, after
    segmentation + polyphone rules (no erhua merge). The unit the
    polyphone-accuracy eval scores; sandhi defaults OFF there so the eval
    measures reading CHOICE, not tone-context rewriting."""
    out: List[Tuple[str, str]] = []
    for w, pys in _segment(text, pdict, sandhi=sandhi):
        if pys:
            out.extend(zip(w, pys))
    return out


def zh_g2p(text: str, pdict: PinyinDict) -> Tuple[List[str], List[int]]:
    """Chinese text -> (phoneme symbols, word2ph per input char).

    Pipeline (reference: preprocessor.rs): jieba cut -> pinyin lookup ->
    tone sandhi -> erhua -> initial/final split.
    """
    phones: List[str] = []
    word2ph: List[int] = []
    for w, pys in _segment(text, pdict):
        if not pys:
            for ch in w:
                if ch.strip():
                    phones.append(ch if ch in ",.!?-…" else ",")
                    word2ph.append(1)
            continue
        w2, pys = apply_erhua(w, pys)
        for py in pys:
            ini, fin = split_pinyin(py)
            n = 0
            if ini:
                phones.append(ini)
                n += 1
            phones.append(fin)
            n += 1
            word2ph.append(n)
    return phones, word2ph
