"""Evaluate-CLI main() wiring: flags -> config -> restore -> evaluate call.

The evaluation chains themselves are covered by tests/test_eval.py on
fabricated volumes; these tests pin the CLI layer (arg parsing, from-name
flag inference — the reference greps checkpoint FILENAMES for hyperparams,
``src/evaluate_mscmrseg.py:249-259``, ``src/evaluate_mmwhs.py:200-216`` —
checkpoint restore, and the kwargs handed to the evaluator) with the model
tiny-fied and the evaluator stubbed, so they run in seconds.
"""

import numpy as np
import jax
import pytest

from pointcloududa_tpu.train import checkpoint as ckpt_lib


@pytest.fixture
def tiny_ckpt(tmp_path, monkeypatch):
    """Make both workload defaults tiny, then write a trainer-layout
    checkpoint for the resulting generator."""
    import pointcloududa_tpu.config as config_mod

    real_ms, real_mm = config_mod.mscmrseg_default, config_mod.mmwhs_default
    tiny = dict(filters=4, n_block=2, crop_size=32, fc_inch=9)  # 9 @ 32px, n_block 2

    def tiny_ms(**kw):
        return real_ms(**{**tiny, **{k: v for k, v in kw.items() if k != "filters"}})

    def tiny_mm(**kw):
        return real_mm(**{**tiny, **{k: v for k, v in kw.items() if k != "filters"}})

    # the CLIs import the symbol at call time from pointcloududa_tpu.config
    monkeypatch.setattr(config_mod, "mscmrseg_default", tiny_ms)
    monkeypatch.setattr(config_mod, "mmwhs_default", tiny_mm)

    from pointcloududa_tpu.train.state import create_train_state

    def write(cfg, path):
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        ckpt_lib.save_pytree(str(path), {"epoch": np.int64(3), "state": {"net": state.gen, "config": None}})
        return state

    return tmp_path, write, tiny_ms, tiny_mm


def test_evaluate_mscmrseg_cli_wiring(tiny_ckpt, monkeypatch, capsys):
    tmp_path, write, tiny_ms, _ = tiny_ckpt
    ckpt = tmp_path / "best_unet_model_checkpoint_x.lr0.001.d1lr2.5e-05.d4lr2.5e-05.Scr0.8"
    write(tiny_ms(d4=True), ckpt)  # the name implies the point head

    calls = {}

    import pointcloududa_tpu.eval.volume as vol

    def fake_eval(cfg, gen, net, **kw):
        calls["cfg"] = cfg
        calls["kw"] = kw
        params = jax.tree.leaves(net.params)
        calls["n_params"] = sum(int(np.asarray(p).size) for p in params)

    monkeypatch.setattr(vol, "evaluate_mscmrseg", fake_eval)
    from pointcloududa_tpu.cli.evaluate_mscmrseg import main

    main(["-model_dir", str(ckpt), "-from_name", "-klc", "-bs", "4",
          "-pat_lo", "6", "-pat_hi", "8", "-ifasd", "0"])
    assert "model loaded from" in capsys.readouterr().out
    assert calls["cfg"].d4 is True  # inferred from 'd4lr' in the name
    assert calls["kw"]["klc"] is True
    assert calls["kw"]["bs"] == 4
    assert calls["kw"]["pat_id_range"] == (6, 8)
    assert calls["kw"]["ifasd"] is False
    assert calls["n_params"] > 0


def test_evaluate_mmwhs_cli_wiring(tiny_ckpt, monkeypatch, capsys):
    tmp_path, write, _, tiny_mm = tiny_ckpt
    ckpt = tmp_path / "best_unet_model_checkpoint_y.lr0.001.mh.softmax"
    write(tiny_mm(), ckpt)

    calls = {}
    import pointcloududa_tpu.eval.volume as vol

    def fake_eval(cfg, gen, net, **kw):
        calls["cfg"] = cfg
        calls["kw"] = kw

    monkeypatch.setattr(vol, "evaluate_mmwhs", fake_eval)
    from pointcloududa_tpu.cli.evaluate_mmwhs import main

    main(["-weight_dir", str(ckpt), "-from_name", "-ifhd", "0"])
    out = capsys.readouterr().out
    assert "model loaded from" in out
    assert "softmax" in out  # from-name tag listing
    assert calls["cfg"].d4 is False
    assert calls["kw"]["ifhd"] is False
