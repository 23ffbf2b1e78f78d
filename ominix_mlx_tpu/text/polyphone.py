"""Context-rule polyphone disambiguation for Mandarin G2P.

The reference resolves 多音字 with a neural g2pW model
(gpt-sovits-mlx/src/text/g2pw.rs). Offline (no checkpoint egress), this
module approximates it with the two levers that cover the bulk of g2pW's
wins over a frequency dictionary:

  1. word-level entries (text/assets/polyphone_words.txt — longest-match
     inside jieba tokens picks the in-context reading), and
  2. POS/context-conditioned rules for the structural particles and
     verb/non-verb splits (地/得/还/长/种/数/量/...), using jieba.posseg
     tags plus adjacent words as the context features the way g2pW uses
     BERT token features.

Accuracy is measured against tests/assets/zh_polyphone_golden.tsv
(tests/test_text_frontend.py::test_polyphone_accuracy).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

# token = [word, pinyins, pos_flag]; prev/nxt may be None at the edges
Tok = list


def _flag(tok: Optional[Tok]) -> str:
    return tok[2] if tok is not None else ""


def _word(tok: Optional[Tok]) -> str:
    return tok[0] if tok is not None else ""


# POS groups (ICTCLAS tags as emitted by jieba.posseg)
_VERBISH = ("v", "vn", "vd", "vg")
# tags that can precede adverbial 地 (adjectives, adverbs, idioms,
# reduplications, descriptives)
_PRE_DE = ("d", "z", "a", "ad", "an", "b", "vn", "i", "l")
# words whose presence right after a char marks verb usage even when
# jieba mis-tags the char itself (量/n 了 体温, 卡/n 在 喉咙)
_VERB_NEXT = ("了", "着", "过", "起来", "下来", "上来", "出来", "在", "到")


def _adverbial_prev(prev: Optional[Tok]) -> bool:
    w = _word(prev)
    return (_flag(prev) in _PRE_DE
            or (len(w) == 2 and w[0] == w[1])          # 慢慢 / 悄悄
            or (len(w) == 4 and w[:2] == w[2:]))       # AABB 高高兴兴


def _rule_de_ground(prev, nxt, flag):
    """地: structural particle (adverbial + 地 + verb) -> de5; the
    ground/place reading di4 is the dictionary default. jieba tags BOTH
    uses 'uv', so the cue is the PRECEDING token."""
    return "de5" if _adverbial_prev(prev) else None


def _rule_dei(prev, nxt, flag):
    """得: the structural particle AFTER a verb/adjective keeps the de5
    default; a subject/adverb before 得 means the modal "must" (dei3);
    de2 readings come from word entries (得到/取得/...)."""
    f = _flag(prev)
    if f and nxt is not None and _word(nxt) not in ("了", "很") \
            and not (f.startswith("v") or f in ("a", "ad", "z", "i", "l")):
        return "dei3"
    return None


def _verb_reading(py: str, next_words=()):
    """Reading used when the char acts as a verb: jieba tags it v*, or a
    verb-marking word follows (aspect particles, directionals), or an
    object from ``next_words`` follows."""
    def rule(prev, nxt, flag):
        if flag.startswith("v") or _word(nxt) in _VERB_NEXT \
                or _flag(nxt) in ("ul", "uz", "ug") \
                or any(_word(nxt).startswith(w) for w in next_words):
            return py
        return None
    return rule


def _rule_zhi(prev, nxt, flag):
    # 只: classifier (一只猫) -> zhi1; adverb "only" -> zhi3 default
    return "zhi1" if flag in ("q", "m") else None


def _rule_gan(prev, nxt, flag):
    # 干: adjective "dry" -> gan1; verb/noun "do / cadre" -> gan4 default
    return "gan1" if flag == "a" else None


def _rule_bao(prev, nxt, flag):
    # 薄: adjective "thin" (single char) -> bao2; compounds (薄弱/单薄)
    # ride word entries with bo2
    return "bao2" if flag == "a" else None


def _rule_chang(prev, nxt, flag):
    # 长: grow (verb) -> zhang3; long (adjective) -> chang2 default.
    # jieba splits 长高/长大/长得 and tags 长/a, so growth is detected by
    # the complement that follows.
    if flag.startswith("v") or _word(nxt) in ("高", "大", "得") \
            or _word(nxt) in _VERB_NEXT:
        return "zhang3"
    return None


def _rule_hai(prev, nxt, flag):
    # 还: return (verb) -> huan2; adverb "still/yet" -> hai2 default.
    # 还了/还给/还钱 mark the verb even when jieba tags 还/d.
    if flag.startswith("v") or _word(nxt) in ("了", "给", "钱", "书", "债"):
        return "huan2"
    return None


def _rule_dao(prev, nxt, flag):
    # 倒: 倒是 split by jieba -> dao4; fall (摔倒/倒下) rides entries/dao3
    return "dao4" if _word(nxt) == "是" else None


def _rule_hang(prev, nxt, flag):
    # 行: trade/profession after 在 (很在行, split by jieba) -> hang2;
    # other hang2 uses ride word entries (银行/行业/各行各业/...)
    return "hang2" if _word(prev) == "在" and flag == "n" else None


def _rule_xiu(prev, nxt, flag):
    # 宿: night-count classifier after a numeral (住了一宿) -> xiu3
    return "xiu3" if _word(prev) in ("一", "半", "几") else None


# single chars mis-merged into measure/number tokens (一行/m, 两只/m):
# reading of the char when the TOKEN is tagged as a quantity
_MEASURE_CHARS = {"只": "zhi1", "行": "hang2", "宿": "xiu3", "斗": "dou3"}

# surname readings fixed when jieba tags a person name (nr)
_SURNAMES = {"曾": "zeng1", "单": "shan4", "解": "xie4", "仇": "qiu2",
             "区": "ou1", "朴": "piao2", "任": "ren2", "燕": "yan1",
             "华": "hua4"}

RULES = {
    "地": _rule_de_ground,
    "得": _rule_dei,
    "长": _rule_chang,
    "还": _rule_hai,
    "倒": _rule_dao,
    "宿": _rule_xiu,
    "种": _verb_reading("zhong4", next_words=(
        "庄稼", "树", "花", "菜", "地", "田", "瓜", "豆", "草", "稻", "麦")),
    "数": _verb_reading("shu3"),
    "量": _verb_reading("liang2"),
    "教": _verb_reading("jiao1"),
    "扇": _verb_reading("shan1"),
    "缝": _verb_reading("feng2"),
    "弹": _verb_reading("tan2"),
    "系": _verb_reading("ji4"),
    "卡": _verb_reading("qia3"),
    "卷": _verb_reading("juan3"),
    "中": _verb_reading("zhong4"),
    "只": _rule_zhi,
    "干": _rule_gan,
    "薄": _rule_bao,
    "行": _rule_hang,
}

# last char of a mis-merged subject+verb token (他中/r + 了): the aspect
# particle that follows marks the verb reading
_VERB_BEFORE_ASPECT = {"中": "zhong4", "落": "luo4"}


def apply_polyphone_rules(words: Sequence[Tok], pdict) -> List[tuple]:
    """words: [[word, pinyins, pos_flag], ...] (pinyins empty for non-zh).
    Returns [(word, pinyins)] with polyphone readings fixed in place."""
    out: List[tuple] = []
    n = len(words)
    for i, tok in enumerate(words):
        w, pys, flag = tok[0], list(tok[1]), tok[2]
        if pys:
            prev = words[i - 1] if i > 0 else None
            nxt = words[i + 1] if i + 1 < n else None
            if len(w) == 1 and w in RULES:
                r = RULES[w](prev, nxt, flag)
                if r is not None:
                    pys = [r]
            elif w not in pdict.table:
                # multi-char token that missed the word table (jieba
                # idiom/compound tokens): positional fixups
                if w.endswith("地") and flag in ("z", "d", "ad"):
                    pys[-1] = "de5"            # 悄悄地/z
                if w.startswith("地") and _adverbial_prev(prev):
                    pys[0] = "de5"             # 慢慢/d + 地走了/l
                if flag in ("m", "q"):
                    for j, ch in enumerate(w):
                        if ch in _MEASURE_CHARS:
                            pys[j] = _MEASURE_CHARS[ch]   # 两只/m 一行/m
                if flag == "nr" and w[0] in _SURNAMES and len(w) > 1:
                    pys[0] = _SURNAMES[w[0]]
                if _flag(nxt) in ("ul", "uz") \
                        and w[-1] in _VERB_BEFORE_ASPECT:
                    pys[-1] = _VERB_BEFORE_ASPECT[w[-1]]
        out.append((w, pys))
    return out
