"""Phoneme symbol table (GPT-SoVITS v2 style).

Reference: gpt-sovits-mlx/src/text/symbols.rs. The table is the union of
punctuation, Mandarin initials/finals with tones, and ARPAbet English
phones with stress markers, in a deterministic sorted order. NOTE: exact
id-for-id parity with a given checkpoint is pinned by the checkpoint's own
symbol list when available (config/symbols asset); this module provides the
deterministic default ordering.
"""

PUNCTUATION = ["!", "?", "…", ",", ".", "-", " "]

PAD = "_"
SP = "SP"      # short pause
SP2 = "SP2"
SP3 = "SP3"
UNK = "UNK"

ZH_INITIALS = [
    "b", "p", "m", "f", "d", "t", "n", "l", "g", "k", "h",
    "j", "q", "x", "zh", "ch", "sh", "r", "z", "c", "s", "y", "w",
]

_ZH_FINAL_BASES = [
    "a", "o", "e", "i", "u", "v", "ai", "ei", "ao", "ou", "ia", "ie",
    "ua", "uo", "ve", "iao", "iou", "uai", "uei", "an", "en", "ang",
    "eng", "ong", "ian", "in", "iang", "ing", "iong", "uan", "uen",
    "uang", "ueng", "un", "vn", "van", "er", "ii", "iii", "E", "En",
    "ir", "AA", "EE", "OO",
]

ZH_FINALS = [f + str(t) for f in _ZH_FINAL_BASES for t in range(1, 6)]

ARPA = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG",
    "OW", "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W",
    "Y", "Z", "ZH",
]
_VOWELS = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH",
           "IY", "OW", "OY", "UH", "UW"}
EN_PHONES = sorted({p + s for p in ARPA
                    for s in (("0", "1", "2") if p in _VOWELS else ("",))})

SYMBOLS = ([PAD, UNK, SP, SP2, SP3] + PUNCTUATION
           + sorted(set(ZH_INITIALS)) + sorted(set(ZH_FINALS))
           + EN_PHONES)

_SYM2ID = {s: i for i, s in enumerate(SYMBOLS)}


def symbol_to_id(sym: str) -> int:
    return _SYM2ID.get(sym, _SYM2ID[UNK])


def load_symbols(path: str):
    """Override the table from a checkpoint asset (one symbol per line) —
    this is how id-exact parity with a real checkpoint is achieved."""
    global SYMBOLS, _SYM2ID
    with open(path) as f:
        SYMBOLS = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
    _SYM2ID = {s: i for i, s in enumerate(SYMBOLS)}
    return SYMBOLS
