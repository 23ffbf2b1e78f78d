"""Text normalization: numbers, punctuation, mixed-width characters.

Reference behaviors: gpt-sovits-mlx/src/text/text_normalizer.rs (zh) and
cn2an.rs (number-to-Chinese). Pure host-side string processing,
implemented from the published rules (not a port of the reference code).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- chinese ---

_DIGITS = "零一二三四五六七八九"
_UNITS_SMALL = ["", "十", "百", "千"]
_UNITS_BIG = ["", "万", "亿", "万亿"]

_PUNCT_MAP = {
    "，": ",", "。": ".", "！": "!", "？": "?", "；": ",", "：": ",",
    "、": ",", "（": ",", "）": ",", "(": ",", ")": ",", "《": "",
    "》": "", "【": "", "】": "", "—": "-", "～": "-", "~": "-",
    "「": "", "」": "", "“": "", "”": "", "‘": "", "’": "", '"': "",
    "'": "", "·": "", "…": "…", "⋯": "…", "％": "%", "＃": "#",
    "＄": "$", "＆": "&", "＋": "+", "－": "-", "．": ".", "／": "/",
    "０": "0", "１": "1", "２": "2", "３": "3", "４": "4", "５": "5",
    "６": "6", "７": "7", "８": "8", "９": "9",
}


def int_to_zh(n: int) -> str:
    """Integer -> Chinese numerals (cn2an 'an2cn' direction, low mode)."""
    if n < 0:
        return "负" + int_to_zh(-n)
    if n == 0:
        return _DIGITS[0]
    groups = []          # 4-digit groups, least significant first
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    parts = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        if g == 0:
            continue
        s = ""
        zero_pending = False
        for pos in range(3, -1, -1):
            d = (g // 10 ** pos) % 10
            if d == 0:
                if s:
                    zero_pending = True
                continue
            if zero_pending:
                s += _DIGITS[0]
                zero_pending = False
            s += _DIGITS[d] + _UNITS_SMALL[pos]
        # a smaller group after a gap needs a leading zero
        if parts and groups[gi + 1:] and g < 1000:
            s = _DIGITS[0] + s
        parts.append(s + _UNITS_BIG[gi])
    out = "".join(parts)
    # 一十X -> 十X at the very front (reads as "shi X")
    if out.startswith("一十"):
        out = out[1:]
    return out


def number_to_zh(num: str) -> str:
    """Decimal string -> spoken Chinese."""
    neg = num.startswith("-")
    if neg:
        num = num[1:]
    if "." in num:
        ip, fp = num.split(".", 1)
        frac = "".join(_DIGITS[int(c)] for c in fp if c.isdigit())
        out = int_to_zh(int(ip or "0")) + "点" + frac
    else:
        out = int_to_zh(int(num))
    return ("负" if neg else "") + out


_RE_PERCENT = re.compile(r"(\d+(?:\.\d+)?)%")
_RE_FRACTION = re.compile(r"(\d+)/(\d+)")
_RE_RANGE = re.compile(r"(\d+)[-~](\d+)")
_RE_DATE = re.compile(r"(\d{4})年")
_RE_NUMBER = re.compile(r"-?\d+(?:\.\d+)?")
_RE_DIGITSEQ = re.compile(r"\d{11,}")   # phone-number-like: read digit-wise


def _digits_zh(s: str) -> str:
    return "".join(_DIGITS[int(c)] if c.isdigit() else c for c in s)


def normalize_zh(text: str) -> str:
    """Normalize a Chinese sentence: width/punctuation mapping and number
    verbalization (reference: text_normalizer.rs + cn2an.rs)."""
    for k, v in _PUNCT_MAP.items():
        text = text.replace(k, v)
    text = _RE_DATE.sub(lambda m: _digits_zh(m.group(1)) + "年", text)
    text = _RE_PERCENT.sub(lambda m: "百分之" + number_to_zh(m.group(1)), text)
    text = _RE_FRACTION.sub(
        lambda m: number_to_zh(m.group(2)) + "分之" + number_to_zh(m.group(1)),
        text)
    text = _RE_RANGE.sub(
        lambda m: number_to_zh(m.group(1)) + "到" + number_to_zh(m.group(2)),
        text)
    text = _RE_DIGITSEQ.sub(lambda m: _digits_zh(m.group(0)), text)
    text = _RE_NUMBER.sub(lambda m: number_to_zh(m.group(0)), text)
    return text


# ---------------------------------------------------------------- english ---

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def int_to_en(n: int) -> str:
    if n < 0:
        return "minus " + int_to_en(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        return _TENS[n // 10] + ("" if n % 10 == 0 else " " + _ONES[n % 10])
    for div, name in ((10 ** 9, "billion"), (10 ** 6, "million"),
                      (1000, "thousand"), (100, "hundred")):
        if n >= div:
            rest = n % div
            head = int_to_en(n // div) + " " + name
            return head if rest == 0 else head + " " + int_to_en(rest)
    return _ONES[n]  # unreachable


def normalize_en(text: str) -> str:
    def num(m):
        s = m.group(0)
        if "." in s:
            ip, fp = s.split(".", 1)
            return (int_to_en(int(ip)) + " point "
                    + " ".join(_ONES[int(c)] for c in fp))
        return int_to_en(int(s))

    text = re.sub(r"\d+(?:\.\d+)?", num, text)
    return text
