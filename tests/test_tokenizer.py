"""gguf-embedded tokenizers (runtime/tokenizer.py).

The reference workflow runs llama-cli straight from a gguf whose
tokenizer lives in metadata (reference tools/run_pipeline.py:222-277);
these tests cover the SPM and BPE rebuilds, byte fallback, special-token
splitting, gguf metadata round-trip, and checkpoint-dir persistence.
"""

import numpy as np
import pytest

from tmac_tpu.convert import gguf
from tmac_tpu.runtime.tokenizer import (
    BPETokenizer, SPMTokenizer, TT_BYTE, TT_CONTROL, TT_NORMAL, TT_UNKNOWN,
    load_tokenizer, tokenizer_from_gguf, _gpt2_pretokenize)


def _spm():
    toks = ["<unk>", "<s>", "</s>", "▁", "▁hello", "▁world",
            "h", "e", "l", "o", "w", "r", "d",
            "he", "ll", "llo", "▁he", "hello",
            "<0xE2>", "<0x82>", "<0xAC>"]
    scores = [0, 0, 0, -1, -5, -6,
              -10, -10, -10, -10, -10, -10, -10,
              -8, -8, -7, -7.5, -6.5,
              -20, -20, -20]
    types = [TT_UNKNOWN, TT_CONTROL, TT_CONTROL] + [TT_NORMAL] * 15 \
        + [TT_BYTE] * 3
    return SPMTokenizer(toks, types, scores)


def test_spm_greedy_merge_and_bos():
    tok = _spm()
    # ▁,h,e,l,l,o -> he(-8) -> ▁he(-7.5) -> +ll -> llo... -> ▁hello(-5)
    assert tok.encode("hello") == [1, 4]


def test_spm_decode_round_trip():
    tok = _spm()
    ids = tok.encode("hello world")
    assert ids[0] == 1  # bos
    assert tok.decode(ids) == "hello world"


def test_spm_byte_fallback():
    tok = _spm()
    ids = tok.encode("€", add_bos=False)
    # ▁ then the three UTF-8 bytes of the euro sign as <0xXX> tokens
    assert ids == [3, 18, 19, 20]
    assert tok.decode(ids) == "€"


def test_spm_special_token_splitting():
    tok = _spm()
    ids = tok.encode("<s>hello", add_bos=False)
    assert ids == [1, 4]
    # control tokens hidden unless skip_special_tokens=False
    assert tok.decode(ids) == "hello"
    assert "<s>" in tok.decode(ids, skip_special_tokens=False)


def test_spm_unknown_char_without_byte_tokens():
    toks = ["<unk>", "<s>", "</s>", "▁", "a"]
    tok = SPMTokenizer(toks, [TT_UNKNOWN, TT_CONTROL, TT_CONTROL,
                              TT_NORMAL, TT_NORMAL], [0, 0, 0, -1, -2])
    ids = tok.encode("aé", add_bos=False)
    assert ids[0] == 3 or ids[0] == 0  # ▁ prefix
    assert 0 in ids  # é has no byte tokens -> unk


def _bpe():
    toks = ["h", "e", "l", "o", "w", "r", "d",
            "he", "hel", "hell", "hello",
            "Ġ", "Ġw", "Ġwo", "Ġwor", "Ġworl", "Ġworld", "<|end|>"]
    types = [TT_NORMAL] * 17 + [TT_CONTROL]
    merges = ["h e", "he l", "hel l", "hell o",
              "Ġ w", "Ġw o", "Ġwo r", "Ġwor l", "Ġworl d"]
    return BPETokenizer(toks, types, merges, eos_token_id=17)


def test_bpe_encode_decode():
    tok = _bpe()
    ids = tok.encode("hello world")
    assert ids == [10, 16]
    assert tok.decode(ids) == "hello world"


def test_bpe_special_and_eos():
    tok = _bpe()
    ids = tok.encode("hello<|end|>")
    assert ids == [10, 17]
    assert tok.decode(ids) == "hello"
    assert tok.eos_token_id == 17


def test_gpt2_pretokenize_splits():
    assert _gpt2_pretokenize("hello world") == ["hello", " world"]
    assert _gpt2_pretokenize("a1 b,c") == ["a", "1", " b", ",", "c"]
    assert _gpt2_pretokenize("it's ok") == ["it", "'s", " ok"]


def test_chat_template_visibility():
    tok = _spm()
    assert not hasattr(tok, "apply_chat_template")
    tok2 = _spm()
    tok2.chat_template = ("{% for m in messages %}{{ m['content'] }}"
                          "{% endfor %}")
    assert hasattr(tok2, "apply_chat_template")
    ids = tok2.apply_chat_template([{"role": "user", "content": "hello"}])
    assert ids == [1, 4]
    text = tok2.apply_chat_template([{"role": "user", "content": "x"}],
                                    tokenize=False)
    assert text == "x"


def test_gguf_metadata_round_trip(tmp_path):
    src = _spm()
    meta = {
        "general.architecture": "llama",
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": src.tokens,
        "tokenizer.ggml.scores": [float(s) for s in src.scores],
        "tokenizer.ggml.token_type": src.token_types,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": True,
        "tokenizer.chat_template": "{{ messages }}",
    }
    path = str(tmp_path / "tok.gguf")
    gguf.write_gguf(path, meta, {
        "dummy.weight": (gguf.GGML_F32, np.zeros((2, 4), np.float32))})
    r = gguf.GGUFReader(path)
    tok = tokenizer_from_gguf(r.metadata)
    r.close()
    assert isinstance(tok, SPMTokenizer)
    for text in ("hello", "hello world", "€ hello"):
        assert tok.encode(text) == src.encode(text)
        assert tok.decode(tok.encode(text)) == text
    assert tok.chat_template == "{{ messages }}"


def test_gguf_bpe_metadata(tmp_path):
    src = _bpe()
    meta = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": src.tokens,
        "tokenizer.ggml.token_type": src.token_types,
        "tokenizer.ggml.merges": src.merges,
        "tokenizer.ggml.eos_token_id": 17,
        "tokenizer.ggml.add_bos_token": False,
    }
    path = str(tmp_path / "tok2.gguf")
    gguf.write_gguf(path, meta, {
        "dummy.weight": (gguf.GGML_F32, np.zeros((2, 4), np.float32))})
    r = gguf.GGUFReader(path)
    tok = tokenizer_from_gguf(r.metadata)
    r.close()
    assert isinstance(tok, BPETokenizer)
    assert tok.encode("hello world") == src.encode("hello world")
    assert tok.eos_token_id == 17


def test_no_tokenizer_metadata_gives_none():
    assert tokenizer_from_gguf({"general.architecture": "llama"}) is None


@pytest.mark.parametrize("make", [_spm, _bpe])
def test_save_load_round_trip(tmp_path, make):
    src = make()
    src.save(str(tmp_path))
    tok = load_tokenizer(str(tmp_path))
    assert type(tok) is type(src)
    for text in ("hello", "hello world"):
        assert tok.encode(text) == src.encode(text)
        assert tok.decode(tok.encode(text)) == src.decode(src.encode(text))
    assert tok.eos_token_id == src.eos_token_id


def test_load_tokenizer_absent(tmp_path):
    assert load_tokenizer(str(tmp_path)) is None


def test_cli_convert_gguf_saves_tokenizer_and_generate_autoloads(tmp_path):
    """gguf with embedded tokenizer -> convert saves it beside the packed
    weights -> generate runs text-in/text-out with NO --tokenizer (the
    reference's single-artifact workflow)."""
    import subprocess
    import sys

    from tests.test_gguf import _write_tiny_llama_gguf
    from tmac_tpu.models.config import get_preset

    cfg0 = get_preset("llama-2-7b").scaled(8)
    src = _spm()
    path = str(tmp_path / "m.gguf")
    rng = np.random.default_rng(3)
    # graft tokenizer metadata onto the tiny-model writer's output
    import tests.test_gguf as tg
    orig = gguf.write_gguf

    def write_with_tok(p, md, tensors):
        md = dict(md)
        md.update({
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": src.tokens,
            "tokenizer.ggml.scores": [float(s) for s in src.scores],
            "tokenizer.ggml.token_type": src.token_types,
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": 2,
        })
        orig(p, md, tensors)

    gguf.write_gguf = write_with_tok
    try:
        _write_tiny_llama_gguf(path, cfg0, rng)
    finally:
        gguf.write_gguf = orig

    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    out_dir = tmp_path / "ck"
    r = subprocess.run(
        [sys.executable, "-m", "tmac_tpu.tools.cli", "convert",
         "--model-dir", path, "--out", str(out_dir), "--name", "t"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "tmac_tokenizer.json").exists()
    assert "tokenizer (llama, 21 tokens)" in r.stdout

    r = subprocess.run(
        [sys.executable, "-m", "tmac_tpu.tools.cli", "generate",
         "--ckpt", str(out_dir), "--prompt", "hello world", "-n", "4"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]


def test_cli_ppl_text_mode(tmp_path):
    """ppl --text tokenizes a raw corpus with the checkpoint's embedded
    tokenizer (the reference llama-perplexity ingestion model)."""
    import json as _json
    import subprocess
    import sys

    from tmac_tpu.convert.checkpoint import save_checkpoint
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import init_params

    cfg = get_preset("bitnet-3b").scaled(8)
    params = init_params(cfg, seed=0)
    save_checkpoint(str(tmp_path / "ck"), cfg, params)
    _spm().save(str(tmp_path / "ck"))
    (tmp_path / "corpus.txt").write_text("hello world " * 40)
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    r = subprocess.run(
        [sys.executable, "-m", "tmac_tpu.tools.cli", "ppl",
         "--ckpt", str(tmp_path / "ck"), "--text",
         str(tmp_path / "corpus.txt"), "--window", "32"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    res = _json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ppl"] > 1 and res["tokens"] > 0


def test_hf_convert_copies_tokenizer_and_autoloads(tmp_path):
    """HF-dir convert copies the tokenizer artifacts into the checkpoint
    dir, and _tokenizer_for falls back to AutoTokenizer on them."""
    import json as _json
    import subprocess
    import sys

    from tests.test_convert import _write_synthetic_hf_gptq
    from tmac_tpu.models.config import get_preset

    cfg0 = get_preset("llama-2-7b").scaled(8)
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    _write_synthetic_hf_gptq(str(hf_dir), cfg0, bits=2, gs=128)
    # minimal real HF-format fast tokenizer (WordLevel; loads offline)
    (hf_dir / "tokenizer.json").write_text(_json.dumps({
        "version": "1.0", "truncation": None, "padding": None,
        "added_tokens": [], "normalizer": None,
        "pre_tokenizer": {"type": "Whitespace"}, "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel",
                  "vocab": {"hello": 0, "world": 1, "<unk>": 2},
                  "unk_token": "<unk>"}}))
    (hf_dir / "tokenizer_config.json").write_text(
        _json.dumps({"tokenizer_class": "PreTrainedTokenizerFast"}))

    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo", "HF_HUB_OFFLINE": "1"}
    out_dir = tmp_path / "ck"
    r = subprocess.run(
        [sys.executable, "-m", "tmac_tpu.tools.cli", "convert",
         "--model-dir", str(hf_dir), "--out", str(out_dir), "--name", "t"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "tokenizer.json").exists()
    assert "+2 tokenizer files" in r.stdout

    import argparse
    from tmac_tpu.tools.cli import _tokenizer_for
    tok = _tokenizer_for(argparse.Namespace(tokenizer="", ckpt=str(out_dir)))
    assert tok is not None
    assert tok.encode("hello world") == [0, 1]


def test_bpe_decode_multibyte_split_across_tokens():
    """A multi-byte UTF-8 char split across BPE tokens must reassemble:
    bytes accumulate in one buffer and decode once (regression: per-token
    decode produced U+FFFD for every accented/CJK char)."""
    from tmac_tpu.runtime.tokenizer import _BYTE_ENC
    # 'é' = 0xC3 0xA9 split across two tokens in byte-unicode space
    t1, t2 = _BYTE_ENC[0xC3], _BYTE_ENC[0xA9]
    tok = BPETokenizer([t1, t2], [TT_NORMAL, TT_NORMAL], [])
    assert tok.decode([0, 1]) == "é"


def test_spm_byte_fallback_split_decode():
    """SPM byte-fallback tokens of one character decode correctly when
    interleaved with normal pieces."""
    tok = _spm()
    ids = tok.encode("hello € hello", add_bos=False)
    assert tok.decode(ids) == "hello € hello"


def test_spm_long_corpus_encode_is_fast():
    """The word-chunked merge keeps whole-corpus encoding linear-ish --
    the ppl --text path must not be O(corpus^2) (regression)."""
    import time
    tok = _spm()
    text = "hello world " * 5000  # ~60k chars
    t0 = time.time()
    ids = tok.encode(text)
    dt = time.time() - t0
    assert dt < 10.0, f"corpus encode took {dt:.1f}s"
    # chunked merge == unchunked merge on a small sample
    small = "hello world hello"
    assert tok.decode(tok.encode(small)) == small


def test_bpe_pre_tokenizer_families(tmp_path):
    """tokenizer.ggml.pre selects the real upstream pretokenizer regex
    (llama-3 chunks digits in threes, qwen2 singly; gpt-2 binds a space
    to digit runs) and survives gguf + save/load round trips."""
    from tmac_tpu.runtime.tokenizer import _pre_regex
    assert _pre_regex("llama-bpe").findall("a 12345") == \
        ["a", " ", "123", "45"]
    assert _pre_regex("qwen2").findall("12") == ["1", "2"]
    assert _pre_regex("gpt-2").findall(" 12345") == [" 12345"]

    src = _bpe()
    src.pre = "llama-bpe"
    src.save(str(tmp_path))
    tok = load_tokenizer(str(tmp_path))
    assert tok.pre == "llama-bpe"

    meta = {"tokenizer.ggml.model": "gpt2",
            "tokenizer.ggml.tokens": src.tokens,
            "tokenizer.ggml.token_type": src.token_types,
            "tokenizer.ggml.merges": src.merges,
            "tokenizer.ggml.pre": "qwen2"}
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, meta, {
        "dummy.weight": (gguf.GGML_F32, np.zeros((2, 4), np.float32))})
    r = gguf.GGUFReader(path)
    tok = tokenizer_from_gguf(r.metadata)
    r.close()
    assert tok.pre == "qwen2"


def test_specials_index_scales():
    """Special-token splitting is indexed by first char -- a 256-special
    vocab over a large text must stay fast."""
    import time
    toks = ["<unk>"] + [f"<|reserved_{i}|>" for i in range(256)] + ["a", "b"]
    types = [TT_UNKNOWN] + [TT_CONTROL] * 256 + [TT_NORMAL, TT_NORMAL]
    tok = SPMTokenizer(toks, types, [0.0] * len(toks), bos_token_id=None,
                       add_bos=False)
    text = "ab" * 30000 + "<|reserved_7|>"
    t0 = time.time()
    ids = tok.encode(text)
    assert time.time() - t0 < 5.0
    assert ids[-1] == 8  # the special resolved
