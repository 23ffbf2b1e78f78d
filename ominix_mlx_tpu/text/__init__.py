"""Text frontend for GPT-SoVITS-style TTS: language segmentation,
normalization, zh/en G2P, tone sandhi, symbol table.

Counterpart of reference gpt-sovits-mlx/src/text/ (~6.5k LoC: normalizer,
cn2an, jieba, tone sandhi, g2p-en, g2pw, erhua, lang segmentation,
symbols). Data-driven assets (pinyin dictionary, cmudict) load from the
model directory at runtime, exactly like the reference's g2pw loads
bopomofo_to_pinyin_wo_tune_dict.json from its model dir (g2pw.rs:81)."""

from ominix_mlx_tpu.text.frontend import TextFrontend, clean_text
from ominix_mlx_tpu.text.symbols import SYMBOLS, symbol_to_id
