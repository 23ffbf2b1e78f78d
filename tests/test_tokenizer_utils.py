"""Chat templating + streaming think-filter tests (reference: minicpm
lib.rs:24 ChatML prompt, lib.rs:55 ThinkFilter)."""

from ominix_mlx_tpu.utils.tokenizer import ThinkFilter, chatml


def test_chatml_format():
    s = chatml([{"role": "user", "content": "hi"}])
    assert s == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"
    s2 = chatml([{"role": "system", "content": "a"},
                 {"role": "user", "content": "b"}],
                add_generation_prompt=False)
    assert s2.count("<|im_start|>") == 2 and s2.endswith("<|im_end|>\n")


def test_think_filter_strips_spans():
    f = ThinkFilter()
    out = f.feed("Hello <think>secret reasoning</think>world!        ")
    assert "secret" not in out and out.startswith("Hello ")
    assert "world!" in out


def test_think_filter_split_across_chunks():
    f = ThinkFilter()
    out = ""
    for chunk in ["He", "llo <th", "ink>hidden", " stuff</thi", "nk> there",
                  "        "]:
        out += f.feed(chunk)
    assert "hidden" not in out
    assert "Hello" in out and "there" in out
