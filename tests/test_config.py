"""Config-system unit tests: key coercion, EMA-in-kimg math, presets."""

import dataclasses

import pytest

from ganlab_tpu.config import (
    OptimConfig,
    PRESETS,
    ScheduleConfig,
    get_config,
    load_config,
)


def test_save_config_round_trips(tmp_path):
    """save_config -> load_config reproduces the config EXACTLY,
    including int-keyed schedule dicts and non-default fields — the
    CLI's workdir-config fallback depends on this."""
    from ganlab_tpu.config import get_config, load_config, save_config

    cfg = get_config("stylegan2-256", **{
        "model.resolution": 64,
        "schedule.batch_schedule": {8: 32, 64: 16},
        "optim.lr_mult_by_res": {64: 0.5},
        "run.seed": 123,
    })
    path = str(tmp_path / "sub" / "config.json")
    save_config(cfg, path)
    assert load_config(path) == cfg


def test_json_int_keyed_dicts_coerced(tmp_path):
    """JSON objects force string keys; batch_schedule / lr_mult_by_res
    lookups must still hit (ADVICE r1: silent fallback to defaults)."""
    path = tmp_path / "cfg.json"
    path.write_text(
        '{"preset": "stylegan-256",'
        ' "schedule": {"batch_schedule": {"256": 8, "128": 12}},'
        ' "optim": {"lr_mult_by_res": {"256": 1.5}}}')
    cfg = load_config(str(path))
    assert cfg.schedule.batch_for(256) == 8
    assert cfg.schedule.batch_for(128) == 12
    assert cfg.optim.lr_mult_by_res.get(256) == 1.5


def test_direct_string_keys_coerced_and_invalid_rejected():
    sc = ScheduleConfig(batch_schedule={"64": 32})
    assert sc.batch_for(64) == 32
    oc = OptimConfig(lr_mult_by_res={"512": 2.0})
    assert oc.lr_mult_by_res == {512: 2.0}
    with pytest.raises(ValueError):
        ScheduleConfig(batch_schedule={"not-a-res": 4})


def test_ema_beta_for_kimg():
    o = OptimConfig(ema_beta=0.999, ema_kimg=None)
    assert o.ema_beta_for(64) == 0.999
    o2 = OptimConfig(ema_kimg=10.0)
    # half-life of 10 kimg: after 10000 images the weight halves.
    beta = o2.ema_beta_for(100)
    assert beta == pytest.approx(0.5 ** (100 / 10000.0))
    # Horizon invariance: beta**(steps) equal when batch x steps match.
    assert o2.ema_beta_for(100) ** 8 == pytest.approx(
        o2.ema_beta_for(800), rel=1e-12)


def test_all_presets_construct():
    for name in PRESETS:
        cfg = get_config(name)
        assert cfg.model.resolution >= 32
        # batch schedule covers the final resolution or falls back.
        assert cfg.schedule.batch_for(cfg.model.resolution) >= 1


def test_judged_preset_recipe_is_the_ab_validated_one():
    """Round-4 recipe A/B (BASELINE.md Finding 6, 5 seeds + bootstrap
    CIs): the fused simultaneous update destabilizes FID (r3), and the
    shared-batch sequential step (fused_seq) — promoted on thin r3
    evidence — measured +66% inception FID vs parity once the EMA
    tracked live weights. The shipped default is the official recipe:
    sequential lazy R1 k=16 with the Adam compensation. Pin it so a
    perf-motivated edit can't silently reintroduce either fused variant
    or drop the compensation."""
    for preset in ("stylegan-256", "stylegan2-256", "stylegan-1024"):
        cfg = get_config(preset)
        assert cfg.loss.penalty_every == 16, preset
        assert cfg.loss.fused_g_step is False, preset
        assert cfg.loss.fused_seq is False, preset
        assert cfg.optim.lazy_adjust is True, preset
        # device-count-invariant G-EMA horizon (VERDICT r2 #4)
        assert cfg.optim.ema_kimg == 10.0, preset


def test_every_preset_times_step_variant_constructs():
    """VERDICT r3 #1: the exclusivity guard now has three interacting
    flags (fused_g_step, fused_seq, grad_accum). Every preset must be
    constructible in every step-variant the CLI can reach — opting into
    one fused mode via apply_overrides clears the other regardless of
    the preset's default."""
    variants = {
        "plain": {"loss.fused_g_step": False, "loss.fused_seq": False},
        "fused": {"loss.fused_g_step": True},
        "fusedseq": {"loss.fused_seq": True},
        "accum": {"optim.grad_accum": 4},
    }
    for preset in PRESETS:
        for name, ov in variants.items():
            cfg = get_config(preset, **ov)
            assert not (cfg.loss.fused_g_step and cfg.loss.fused_seq), (
                preset, name)
            if name == "fused":
                assert cfg.loss.fused_g_step, (preset, name)
            if name == "fusedseq":
                assert cfg.loss.fused_seq, (preset, name)
            if name == "accum":
                assert cfg.optim.grad_accum == 4, (preset, name)
