"""Native Emu3 tiktoken tokenizer parity against the reference Emu3Tokenizer
(emu3/mllm/tokenization_emu3.py), imported read-only as an oracle on a
synthetic byte-level vocabulary (the real emu3.tiktoken has 151643 entries;
the toy one covers the same code paths: BPE text, atomic special tokens,
vision tokens, skip-special decode)."""

import base64
import sys

import pytest

from sjd_tpu.utils.emu3_tokenizer import (
    DEFAULT_NEGATIVE_PROMPT,
    DEFAULT_POSITIVE_SUFFIX,
    Emu3Tokenizer,
)

tiktoken = pytest.importorskip("tiktoken")
torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("emu3_vocab")
    vocab = d / "emu3.tiktoken"
    with open(vocab, "w") as f:
        for b in range(256):
            f.write(base64.b64encode(bytes([b])).decode() + f" {b}\n")
    vision = d / "emu3_vision_tokens.txt"
    with open(vision, "w") as f:
        for name in ("<|image start|>", "<|image end|>", "<|image token|>"):
            f.write(name + "\n")
        for i in range(8):
            f.write(f"<|visual token {i:06d}|>\n")
    return str(vocab), str(vision)


@pytest.fixture(scope="module")
def pair(vocab_files):
    import emu3.mllm.tokenization_emu3 as ref_mod

    ref_mod.SPECIAL_START_ID = 256  # toy vocab is 256 byte tokens
    ref = ref_mod.Emu3Tokenizer(*vocab_files)
    ours = Emu3Tokenizer(*vocab_files)
    return ours, ref


TEXTS = [
    "hello world",
    "90*90",
    "a photo of <|image start|>90*90<|image token|>",
    "<|extra_203|>text then <|extra_204|>",
    "<|visual token 000003|><|extra_200|><|visual token 000005|>",
    DEFAULT_NEGATIVE_PROMPT,
    "prompt" + DEFAULT_POSITIVE_SUFFIX,
]


@pytest.mark.parametrize("text", TEXTS)
def test_encode_matches_reference(pair, text):
    ours, ref = pair
    got = ours.encode(text)
    want = [ref.special_tokens.get(t, ref.mergeable_ranks.get(t))
            for t in ref.tokenize(text)]
    assert got == want


@pytest.mark.parametrize("text", TEXTS)
def test_decode_roundtrip_matches_reference(pair, text):
    ours, ref = pair
    ids = ours.encode(text)
    assert ours.decode(ids) == ref._decode(ids)
    assert ours.decode(ids) == text


def test_special_token_ids_match_reference(pair):
    ours, ref = pair
    assert ours.special_tokens == ref.special_tokens
    assert ours.bos_id == ref.special_tokens[ref.bos_token]
    assert ours.eos_id == ref.special_tokens[ref.eos_token]
    assert ours.pad_id == ref.special_tokens[ref.pad_token]
    assert ours.boi_id == ref.special_tokens[ref.boi_token]
    assert ours.eoi_id == ref.special_tokens[ref.eoi_token]
    assert ours.eol_id == ref.special_tokens[ref.eol_token]
    assert ours.eof_id == ref.special_tokens[ref.eof_token]
    assert ours.img_id == ref.special_tokens[ref.img_token]
    assert len(ours) == len(ref)


def test_skip_special_tokens_decode(pair):
    ours, ref = pair
    ids = ours.encode("hi <|extra_200|> there")
    assert ours.decode(ids, skip_special_tokens=True) == ref._decode(
        ids, skip_special_tokens=True
    )


def test_real_special_start_id_layout(vocab_files):
    """With the real files the computed start equals the reference's
    hardcoded 151643 because the text vocab has exactly that many ranks;
    the toy vocab proves the computed-start rule (256 here)."""
    ours = Emu3Tokenizer(*vocab_files)
    assert min(ours.special_tokens.values()) == 256
    ours2 = Emu3Tokenizer(*vocab_files, special_start_id=256)
    assert ours2.special_tokens == ours.special_tokens


def test_load_emu3_default_negative_prompt(vocab_files, monkeypatch):
    """load_emu3 builds the reference's default negative prompt as a FULL
    generation prompt (bos + neg text + boi + size + img), and appends the
    positive suffix (test_emu3.py:56-79). Heavy parts are stubbed."""
    import numpy as np

    import sjd_tpu.loader as L
    import sjd_tpu.models.emu3 as emu3_mod

    captured = {}

    class FakeEngine:
        model_cfg = None

        def generate(self, params, rng, prompt, neg_prompt=None, gstate=None):
            captured["pos"] = np.asarray(prompt)[0].tolist()
            captured["neg"] = np.asarray(neg_prompt)[0].tolist()

            class R:
                tokens = np.zeros((1, 8), np.int32)
                length = np.asarray([1])

            raise RuntimeError("stop")  # skip decode

    monkeypatch.setattr(emu3_mod, "emu3_engine",
                        lambda **k: FakeEngine())
    monkeypatch.setattr(L, "_build_decoder_params", lambda *a, **k: {})

    tok = Emu3Tokenizer(*vocab_files)
    model = L.load_emu3(tokenizer=tok, h=4, w=4)
    with pytest.raises(RuntimeError):
        model.sample_fn("a cat")

    from sjd_tpu.data.emu3_processor import build_gen_prompt

    want_pos = build_gen_prompt(
        tok.encode("a cat" + DEFAULT_POSITIVE_SUFFIX), 4, 4, tok.encode)
    want_neg = build_gen_prompt(
        tok.encode(DEFAULT_NEGATIVE_PROMPT), 4, 4, tok.encode)
    assert captured["pos"] == want_pos
    assert captured["neg"] == want_neg


def test_understanding_prompt_matches_whole_string_tokenization(vocab_files):
    """build_understanding_prompt assembles ids piecewise; the reference
    builds ONE string (chat template + to_imgstr) and tokenizes it whole
    (processing_emu3.py:152-181). Both must agree — the piecewise splits sit
    only on atomic special-token boundaries."""
    import numpy as np

    from sjd_tpu.data.emu3_processor import (
        CHAT_POST,
        CHAT_PRE,
        build_understanding_prompt,
    )

    tok = Emu3Tokenizer(*vocab_files)
    grid = np.asarray([[3, 1], [0, 7]], np.int32)

    # the reference's string construction (to_imgstr + template)
    imgstr = tok.eol_token.join(
        "".join(f"<|visual token {c:0>6d}|>" for c in row) for row in grid
    )
    image_prompt = (
        tok.boi_token + "2*2" + tok.img_token + imgstr
        + tok.eol_token + tok.eof_token + tok.eoi_token
    )
    text_prompt = "what is this"
    whole = tok.bos_token + (
        CHAT_PRE + image_prompt + text_prompt + CHAT_POST
    )
    want = tok.encode(whole)

    vis0 = tok.token_to_id("<|visual token 000000|>")
    got = build_understanding_prompt(
        text_prompt, grid, tok.encode,
        special=dict(bos=tok.bos_id, boi=tok.boi_id, img=tok.img_id,
                     eol=tok.eol_id, eof=tok.eof_id, eoi=tok.eoi_id,
                     visual_start=vis0),
    )
    assert got == want


def test_load_emu3_understand_fn(vocab_files, monkeypatch):
    """understand_fn: image -> VQ grid -> chat prompt -> grammarless text
    generation over the same params. Heavy parts stubbed; asserts the prompt
    reaching the engine is build_understanding_prompt's output and that the
    generated tail (after the prompt) is returned."""
    import numpy as np

    import sjd_tpu.loader as L
    import sjd_tpu.models.emu3 as emu3_mod

    tok = Emu3Tokenizer(*vocab_files)
    grid = np.asarray([[1, 2], [3, 4]], np.int32)
    captured = {}

    class FakeGenEngine:
        model_cfg = None
        model = "MODEL_FNS"

        class config:  # dataclass stand-in for _dc.replace
            pass

    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class FakeCfg:
        cfg_mode: str = "neg_prompt"
        max_len: int = 0
        eos_id: int = -1

    FakeGenEngine.config = FakeCfg()

    monkeypatch.setattr(emu3_mod, "emu3_engine", lambda **k: FakeGenEngine())
    monkeypatch.setattr(L, "_build_decoder_params", lambda *a, **k: {})

    import sjd_tpu.models.vq.emu3_vq as emu3_vq_mod

    monkeypatch.setattr(
        emu3_vq_mod, "encode",
        lambda p, c, px: np.asarray(grid[None]),
    )

    class FakeUEngine:
        def __init__(self, model, config, spec, sampling):
            captured["config"] = config
            captured["spec_kind"] = spec.kind
            captured["do_cfg"] = sampling.do_cfg
            captured["model"] = model

        def generate(self, params, rng, prompt, prompt_mask=None):
            ids = np.asarray(prompt)[0]
            mask = np.asarray(prompt_mask)[0]
            captured["prompt"] = ids[mask].tolist()
            captured["bucket"] = len(ids)

            class R:
                tokens = np.concatenate([prompt, np.full((1, 3), 7)], axis=1)
                length = np.asarray([len(ids) + 3])

            return R()

    import sjd_tpu.core.engine as eng_mod
    import sjd_tpu.models.adapter as adapter_mod

    monkeypatch.setattr(eng_mod, "SJDEngine", FakeUEngine)
    monkeypatch.setattr(adapter_mod, "decoder_model_fns",
                        lambda cfg, **k: "U_MODEL_FNS")

    # stub VQ loading so understand_fn's vq_params guard passes
    monkeypatch.setattr(L, "_load_sharded_state", lambda d: {})
    import sjd_tpu.models.vq.emu3_port as port_mod

    monkeypatch.setattr(port_mod, "port_emu3_vq", lambda s, c: {"stub": 1})
    model = L.load_emu3(tokenizer=tok, h=4, w=4, vq_ckpt_dir="/tmp")

    out = model.extras["understand_fn"]("what is this", np.zeros((16, 16, 3)))
    from sjd_tpu.data.emu3_processor import build_understanding_prompt

    want = build_understanding_prompt("what is this", grid,
                                      lambda s: list(tok.encode(s)))
    assert captured["prompt"] == want
    assert captured["bucket"] == 4 * 5 + 128  # fixed pad bucket: one compile
    assert captured["spec_kind"] == "none"
    assert not captured["do_cfg"]
    assert captured["config"].cfg_mode == "none"
    assert captured["model"] == "U_MODEL_FNS"  # own RoPE-length model fns
    assert out == [7, 7, 7]
