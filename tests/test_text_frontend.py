"""Golden tests for the text frontend: zh normalization (numbers), pinyin
split, tone sandhi, erhua, language segmentation, en G2P — the reference's
text/ test strategy (gpt-sovits-mlx/src/text/) with an embedded mini
pinyin table standing in for the runtime asset."""

import os

from ominix_mlx_tpu.text import frontend as fe
from ominix_mlx_tpu.text import normalizer as nz
from ominix_mlx_tpu.text import zh_g2p as zg
from ominix_mlx_tpu.text import en_g2p as eg
from ominix_mlx_tpu.text.symbols import SYMBOLS, symbol_to_id

MINI_PINYIN = {
    "你": ["ni3"], "好": ["hao3"], "你好": ["ni3", "hao3"],
    "不": ["bu4"], "是": ["shi4"], "一": ["yi1"], "个": ["ge4"],
    "天": ["tian1"], "中": ["zhong1"], "国": ["guo2"],
    "中国": ["zhong1", "guo2"], "花": ["hua1"], "儿": ["er2"],
    "花儿": ["hua1", "er2"], "儿子": ["er2", "zi3"], "子": ["zi3"],
    "我": ["wo3"], "很": ["hen3"],
}

MINI_CMU = {"HELLO": ["HH", "AH0", "L", "OW1"],
            "WORLD": ["W", "ER1", "L", "D"]}


def test_int_to_zh_golden():
    cases = {0: "零", 7: "七", 10: "十", 14: "十四", 20: "二十",
             105: "一百零五", 1234: "一千二百三十四",
             10000: "一万", 100010001: "一亿零一万零一"}
    for n, want in cases.items():
        assert nz.int_to_zh(n) == want, (n, nz.int_to_zh(n), want)


def test_normalize_zh_numbers_and_punct():
    assert nz.normalize_zh("我有3个") == "我有三个"
    assert nz.normalize_zh("价格是2.5元！") == "价格是二点五元!"
    assert nz.normalize_zh("占50%") == "占百分之五十"
    assert nz.normalize_zh("1/3的人") == "三分之一的人"


def test_split_pinyin():
    assert zg.split_pinyin("zhong1") == ("zh", "ong1")
    assert zg.split_pinyin("hao3") == ("h", "ao3")
    assert zg.split_pinyin("er2") == ("", "er2")
    assert zg.split_pinyin("liu2") == ("l", "iou2")   # iu -> iou respell
    assert zg.split_pinyin("zi3") == ("z", "ii3")     # syllabic consonant


def test_tone_sandhi_third_tone():
    words = [("你好", ["ni3", "hao3"])]
    out = zg.tone_sandhi(words)
    assert out[0][1] == ["ni2", "hao3"]


def test_tone_sandhi_bu_and_yi():
    out = zg.tone_sandhi([("不", ["bu4"]), ("是", ["shi4"])])
    assert out[0][1] == ["bu2"]                       # bu4 -> bu2 before 4
    out = zg.tone_sandhi([("一", ["yi1"]), ("个", ["ge4"])])
    assert out[0][1] == ["yi2"]                       # yi -> yi2 before 4
    out = zg.tone_sandhi([("一", ["yi1"]), ("天", ["tian1"])])
    assert out[0][1] == ["yi4"]                       # yi -> yi4 before 1-3


def test_erhua_merge_and_whitelist():
    w, pys = zg.apply_erhua("花儿", ["hua1", "er2"])
    assert w == "花" and pys == ["huar1"]
    w, pys = zg.apply_erhua("儿子", ["er2", "zi3"])
    assert w == "儿子" and pys == ["er2", "zi3"]      # whitelisted


def test_zh_g2p_pipeline():
    pd = zg.PinyinDict(table=MINI_PINYIN)
    phones, word2ph = zg.zh_g2p("你好", pd)
    assert phones == ["n", "i2", "h", "ao3"]
    assert word2ph == [2, 2]
    assert sum(word2ph) == len(phones)


def test_language_segmentation():
    segs = fe.segment_languages("hello你好world")
    assert segs == [("en", "hello"), ("zh", "你好"), ("en", "world")]


def test_en_g2p_with_dict_and_fallback():
    cmu = eg.CMUDict(table=MINI_CMU)
    assert eg.en_g2p("hello world", cmu) == (
        ["HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"])
    # OOV goes through the letter fallback, never fails
    phones = eg.en_g2p("zorgle", cmu)
    assert len(phones) > 0


def test_frontend_end_to_end_ids():
    f = fe.TextFrontend(pinyin_table=MINI_PINYIN, cmu_table=MINI_CMU)
    ids, word2ph = fe.clean_text("hello你好", frontend=f)
    assert len(ids) == len(MINI_CMU["HELLO"]) + 4
    assert all(0 <= i < len(SYMBOLS) for i in ids)
    # zh phones map to their own symbols, not UNK
    assert ids[-1] == symbol_to_id("ao3")
    assert ids[-4] != symbol_to_id("UNK")


def test_mixed_numbers_in_zh():
    f = fe.TextFrontend(pinyin_table={**MINI_PINYIN,
                                      "三": ["san1"], "有": ["you3"]})
    phones, _ = f.g2p("我有3个")
    assert "s" in phones and "an1" in phones          # 3 -> 三 -> san1


# ---------------- bundled-asset golden tests (no external assets) -----------

def test_bundled_assets_load():
    """The frontend must work OUT OF THE BOX: bundled pinyin table covers
    the top-1000 hanzi (scripts/build_text_assets.py --coverage) and the
    bundled CMUdict has >100k entries."""
    f = fe.TextFrontend()
    assert len(f.pinyin.table) > 1500
    assert len(f.cmu.table) > 100_000


def test_zh_golden_sentences():
    """Real sentences through the bundled table: exact phoneme strings
    (initial/final+tone), sandhi applied."""
    f = fe.TextFrontend()

    def flat(text):
        return " ".join(f.g2p(text)[0])

    assert flat("你好") == "n i2 h ao3"                       # 3-3 sandhi
    assert flat("我们是朋友") == "w o3 m en5 sh iii4 p eng2 y ou5"
    assert flat("中国人民") == "zh ong1 g uo2 r en2 m in2"
    assert flat("不对") == "b u2 d uei4"                      # 不 + tone4
    assert flat("一样") == "y i2 y ang4"                      # 一 + tone4
    assert flat("一天") == "y i4 t ian1"                      # 一 + tone1
    assert flat("第一") == "d i4 y i1"                        # ordinal
    assert flat("好不好") == "h ao3 b u5 h ao3"               # reduplication
    assert flat("看一看") == "k an4 y i5 k an4"
    assert flat("我在银行工作") == \
        "w o3 z ai4 y in2 h ang2 g ong1 z uo4"                # polyphone
    assert flat("他的头发很长") == \
        "t a1 d e5 t ou2 f a5 h en3 ch ang2"                  # 头发 neutral
    assert flat("谢谢妈妈") == "x ie4 x ie5 m a1 m a5"        # neutral tone
    assert flat("我很好") == "w o2 h en2 h ao3"               # chained 3-3-3


def test_en_golden_sentences():
    f = fe.TextFrontend()
    phones = f.g2p("hello world", lang="en")[0]
    assert phones == ["HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"]
    # real CMUdict pronunciations, not letter fallback
    phones = f.g2p("the quick brown fox", lang="en")[0]
    assert "K" in phones and "F" in phones and len(phones) >= 11


def test_mixed_language_sentence():
    f = fe.TextFrontend()
    phones, w2 = f.g2p("我爱TPU芯片")
    # zh part resolves through the table; latin run letter-spells via
    # CMUdict single letters
    assert "ai4" in phones
    assert any(p.isupper() for p in phones)


def test_zh_golden_rare_hanzi():
    """Rarer hanzi (beyond the original top-1500 table) resolve through the
    extended GB2312-coverage table (VERDICT r3 item 3): exact readings, not
    the OOV filler."""
    f = fe.TextFrontend()

    def flat(text):
        return " ".join(f.g2p(text)[0])

    assert flat("魑魅魍魉") == "ch iii1 m ei4 w ang2 l iang3"   # 3-3 sandhi
    assert flat("饕餮") == "t ao1 t ie4"
    assert flat("耄耋之年") == "m ao4 d ie2 zh iii1 n ian2"
    assert flat("沆瀣一气") == "h ang4 x ie4 y i2 q i4"
    assert flat("龃龉") == "j v2 y v3"                          # 3-3 + j+u=v


def test_zh_v_final_after_jqxy():
    """ü spelled as u after j/q/x/y maps to the v-family finals (the
    symbol table has v/ve/vn/van for exactly this)."""
    f = fe.TextFrontend()

    def flat(text):
        return " ".join(f.g2p(text)[0])

    assert flat("句") == "j v4"
    assert flat("军") == "j vn1"
    assert flat("全") == "q van2"
    assert flat("雨") == "y v3"
    assert flat("月") == "y ve4"
    assert flat("论") == "l uen4"       # real u stays u


def test_zh_oov_fallback_is_per_char():
    """A word containing one unknown char keeps the KNOWN chars' readings;
    only the unknown char degrades to the neutral filler (never a dropped
    phone)."""
    from ominix_mlx_tpu.text.zh_g2p import PinyinDict

    pd = PinyinDict(bundled=False,
                    table={"好": ["hao3"], "你": ["ni3"]})
    assert pd.lookup_lenient("你好") == ["ni3", "hao3"]
    got = pd.lookup_lenient("你㿘")            # second char unknown anywhere
    assert got[0] == "ni3" and got[1] == "a5" and len(got) == 2


# ------------------------------------------------- polyphone accuracy ------

GOLDEN_TSV = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "assets", "zh_polyphone_golden.tsv")


def polyphone_eval():
    """Score per_char_pinyin against the hand-curated golden set.
    Returns (accuracy, failures) where each failure is
    (sentence, target_char, expected, got)."""
    from ominix_mlx_tpu.text.zh_g2p import PinyinDict, per_char_pinyin

    pdict = PinyinDict()
    total, hits, failures = 0, 0, []
    with open(GOLDEN_TSV, encoding="utf-8") as f:
        for ln in f:
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            marked, expected = ln.split("\t")
            i = marked.index("【")
            target = marked[i + 1]
            text = marked.replace("【", "").replace("】", "")
            chars = per_char_pinyin(text, pdict)
            # i is the char index of the target in the unmarked text among
            # zh chars only when the sentence is pure zh; map by position:
            zh_pos = [j for j, ch in enumerate(text) if ch == target]
            occurrence = sum(1 for ch in text[:i] if ch == target)
            got = None
            seen = 0
            for ch, py in chars:
                if ch == target:
                    if seen == occurrence:
                        got = py
                        break
                    seen += 1
            total += 1
            if got == expected:
                hits += 1
            else:
                failures.append((text, target, expected, got))
    return hits / max(total, 1), failures


def test_polyphone_accuracy():
    """多音字 disambiguation vs the golden set (VERDICT r4 #5). The
    reference resolves these with a neural g2pW model; the dict+rules
    pipeline must stay above the asserted floor."""
    acc, failures = polyphone_eval()
    assert acc >= 0.95, (
        f"polyphone accuracy {acc:.3f} below floor; first failures: "
        f"{failures[:10]}")


if __name__ == "__main__":
    acc, failures = polyphone_eval()
    print(f"polyphone accuracy: {acc:.4f} ({len(failures)} failures)")
    for text, ch, exp, got in failures:
        print(f"  {text}  【{ch}】 expected {exp} got {got}")
