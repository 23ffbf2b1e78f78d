#!/usr/bin/env python
"""Build the bundled text-frontend data assets.

Run offline wherever the source data lives; commit the outputs under
ominix_mlx_tpu/text/assets/ so the zh/en frontends work out of the box
(no runtime downloads — the environment has no egress).

Sources:
  - CMUdict 0.7b (BSD 2-clause, Carnegie Mellon University) — any
    cmudict(.rep/.dict) format file. The license requires retaining the
    copyright notice; it is reproduced in assets/CMUDICT_LICENSE.
  - jieba's dict.txt (word frequencies) — used only to RANK characters for
    the coverage report of the hand-curated pinyin table; no jieba data is
    copied into the assets.

Usage:
  python scripts/build_text_assets.py --cmudict /path/to/cmudict.rep
  python scripts/build_text_assets.py --coverage   # pinyin table coverage
"""

import argparse
import gzip
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "ominix_mlx_tpu", "text", "assets")

CMU_LICENSE = """CMUdict 0.7b
Copyright (C) 1993-2015 Carnegie Mellon University. All rights reserved.

Redistribution and use in source and binary forms, with or without
modification, are permitted provided that the following conditions are met:
1. Redistributions of source code must retain the above copyright notice,
   this list of conditions and the following disclaimer. The contents of
   this file are deemed to be source code.
2. Redistributions in binary form must reproduce the above copyright
   notice, this list of conditions and the following disclaimer in the
   documentation and/or other materials provided with the distribution.

This work was supported in part by funding from the Defense Advanced
Research Projects Agency, the Office of Naval Research and the National
Science Foundation of the United States of America, and by member
companies of the Carnegie Mellon Sphinx Speech Consortium.

THIS SOFTWARE IS PROVIDED BY CARNEGIE MELLON UNIVERSITY ``AS IS'' AND ANY
EXPRESSED OR IMPLIED WARRANTIES, INCLUDING, BUT NOT LIMITED TO, THE IMPLIED
WARRANTIES OF MERCHANTABILITY AND FITNESS FOR A PARTICULAR PURPOSE ARE
DISCLAIMED.
"""

_WORD = re.compile(r"^[A-Z][A-Z']*$")


def build_cmudict(src: str):
    """cmudict format -> compact gz: ``word<TAB>P1 P2 ...`` lowercase,
    primary pronunciation only, alphabetic headwords only."""
    out = {}
    with open(src, encoding="latin-1") as f:
        for ln in f:
            if ln.startswith(";;;"):
                continue
            parts = ln.split()
            if len(parts) < 2 or "(" in parts[0]:
                continue
            w = parts[0]
            if not _WORD.match(w):
                continue
            out[w.lower()] = " ".join(parts[1:])
    os.makedirs(ASSETS, exist_ok=True)
    dst = os.path.join(ASSETS, "cmudict.txt.gz")
    with gzip.open(dst, "wt", encoding="utf-8") as f:
        for w in sorted(out):
            f.write(f"{w}\t{out[w]}\n")
    with open(os.path.join(ASSETS, "CMUDICT_LICENSE"), "w") as f:
        f.write(CMU_LICENSE)
    print(f"wrote {dst}: {len(out)} entries")


def _gb2312(ch: str) -> bool:
    """GB2312-encodable filter: jieba's dict.txt contains GBK-mojibake
    artifacts (UTF-8 text misdecoded as GBK upstream, e.g. 紝銆鐨) that rank
    as 'frequent'; real simplified hanzi encode in GB2312, artifacts
    almost never do."""
    try:
        ch.encode("gb2312")
        return True
    except UnicodeEncodeError:
        return False


def _char_freq():
    import jieba
    from collections import Counter

    freq = Counter()
    with open(os.path.join(os.path.dirname(jieba.__file__), "dict.txt"),
              encoding="utf-8") as f:
        for ln in f:
            w, n = ln.split()[:2]
            for ch in w:
                if "一" <= ch <= "鿿" and _gb2312(ch):
                    freq[ch] += int(n)
    return freq


def coverage():
    """Rank hanzi by frequency (jieba dict, GB2312-filtered) and report
    pinyin-table coverage of the top-N — by type AND frequency-weighted by
    token (the production number: P(char of running text is covered)) —
    listing the most frequent MISSING chars so the table can be extended
    where it matters."""
    from ominix_mlx_tpu.text.zh_g2p import PinyinDict

    freq = _char_freq()
    pd = PinyinDict()           # bundled table
    total_tok = sum(freq.values())
    cov_tok = sum(n for c, n in freq.items() if c in pd.table)
    print(f"table: {sum(1 for k in pd.table if len(k) == 1)} chars, "
          f"{sum(1 for k in pd.table if len(k) > 1)} word entries")
    print(f"token-weighted coverage (all {len(freq)} ranked chars): "
          f"{100 * cov_tok / total_tok:.4f}%")
    for top in (500, 1000, 1500, 2500, 3500, 5000, 7000):
        chars = [c for c, _ in freq.most_common(top)]
        have = sum(1 for c in chars if c in pd.table)
        print(f"top-{top}: {have}/{top} covered ({100*have/top:.1f}%)")
    missing = [c for c, _ in freq.most_common(7000) if c not in pd.table]
    print(f"missing among top-7000 ({len(missing)}):")
    for i in range(0, min(len(missing), 2000), 100):
        print("  " + "".join(missing[i:i + 100]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cmudict", default=None,
                    help="path to a cmudict-format source file")
    ap.add_argument("--coverage", action="store_true")
    args = ap.parse_args()
    if args.cmudict:
        build_cmudict(args.cmudict)
    if args.coverage:
        coverage()
    if not args.cmudict and not args.coverage:
        ap.print_help()


if __name__ == "__main__":
    main()
