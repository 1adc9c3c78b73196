"""Smoke-mode surfacing on LoadedModel (VERDICT r2 weak #7): every loader
fallback path (random weights, placeholder prompt ids, random VQ) must set
``extras["smoke"]`` + reasons so callers can't mistake harness outputs for
real generations."""

import numpy as np
import pytest

import sjd_tpu.loader as L
from sjd_tpu.models.vq import VQConfig


TINY_VQ = VQConfig(ch=32, ch_mult=(1, 1, 1, 1, 1), num_res_blocks=1,
                   z_channels=32, embed_dim=32, n_embed=64)


class _FakeCfg:
    import jax.numpy as _jnp

    dtype = _jnp.float32


class FakeEngine:
    model_cfg = _FakeCfg()


def _stub_heavy(monkeypatch):
    import sjd_tpu.models.anole as anole_mod
    import sjd_tpu.models.chameleon as cham_mod
    import sjd_tpu.models.emu3 as emu3_mod
    import sjd_tpu.models.llamagen as lg_mod
    import sjd_tpu.models.vq as vq_mod

    monkeypatch.setattr(L, "_build_decoder_params", lambda *a, **k: {})
    monkeypatch.setattr(vq_mod, "CHAMELEON_VQ", TINY_VQ)
    monkeypatch.setattr(vq_mod, "LLAMAGEN_VQ16", TINY_VQ)
    monkeypatch.setattr(anole_mod, "anole_engine", lambda **k: FakeEngine())
    monkeypatch.setattr(cham_mod, "lumina_engine", lambda **k: FakeEngine())
    monkeypatch.setattr(emu3_mod, "emu3_engine", lambda **k: FakeEngine())
    monkeypatch.setattr(lg_mod, "llamagen_engine", lambda **k: FakeEngine())
    monkeypatch.setattr(
        lg_mod, "init_cond_params", lambda *a, **k: {}, raising=True
    )


def test_anole_all_fallbacks_flagged(monkeypatch):
    _stub_heavy(monkeypatch)
    model = L.load_anole()
    assert model.smoke and model.extras["smoke"]
    joined = " ".join(model.extras["smoke_reasons"])
    assert "random decoder weights" in joined
    assert "random VQ" in joined
    assert "placeholder prompt ids" in joined


def test_lumina_all_fallbacks_flagged(monkeypatch):
    _stub_heavy(monkeypatch)
    model = L.load_lumina_mgpt()
    assert model.smoke
    assert any("placeholder" in r for r in model.extras["smoke_reasons"])


def test_emu3_tokenizer_removes_placeholder_reason(monkeypatch):
    _stub_heavy(monkeypatch)
    import sjd_tpu.models.vq.emu3_port as emu3_port

    monkeypatch.setattr(emu3_port, "init_emu3_vq_params", lambda *a, **k: {})

    class Tok:
        def encode(self, s):
            return [1500]

    model = L.load_emu3(tokenizer=Tok(), h=4, w=4)
    assert model.smoke  # still random weights + random VQ
    assert not any("placeholder" in r for r in model.extras["smoke_reasons"])


def test_llamagen_flags(monkeypatch):
    _stub_heavy(monkeypatch)
    model = L.load_llamagen(name="GPT-B")
    assert model.smoke
    assert any("random GPT weights" in r for r in model.extras["smoke_reasons"])


def test_smoke_warning_logged(monkeypatch, caplog):
    _stub_heavy(monkeypatch)
    import logging

    with caplog.at_level(logging.WARNING, logger="sjd_tpu.loader"):
        L.load_anole()
    assert any("SMOKE mode" in r.message for r in caplog.records)


def test_no_reasons_means_not_smoke():
    extras = L._mark_smoke({}, "x", [])
    assert extras["smoke"] is False and extras["smoke_reasons"] == []
