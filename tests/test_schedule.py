"""Golden-table test of the progressive schedule state machine (SURVEY.md 4)."""

import pytest

from ganlab_tpu.config import ModelConfig, ScheduleConfig
from ganlab_tpu.train.schedule import alpha_at, build_phases, phase_at


def test_non_progressive_single_phase():
    sched = ScheduleConfig(progressive=False, total_kimg=10.0)
    model = ModelConfig(model="progan", resolution=64)
    phases = build_phases(sched, model)
    assert len(phases) == 1
    p = phases[0]
    assert (p.res_log2, p.kind, p.start_img, p.end_img) == (6, "stabilize",
                                                            0, 10000)


def test_progressive_golden_table():
    # start 4 -> 16, fade 2 kimg, stabilize 3 kimg, total 20 kimg.
    sched = ScheduleConfig(progressive=True, start_res=4, fade_kimg=2.0,
                           stabilize_kimg=3.0, total_kimg=20.0,
                           batch_schedule={4: 16, 8: 8, 16: 4})
    model = ModelConfig(model="progan", resolution=16)
    phases = build_phases(sched, model)
    # Hand-computed: (res, kind, start, end, batch)
    expected = [
        (2, "stabilize", 0, 3000, 16),
        (3, "fade", 3000, 5000, 8),
        (3, "stabilize", 5000, 8000, 8),
        (4, "fade", 8000, 10000, 4),
        (4, "stabilize", 10000, 20000, 4),  # final absorbs remaining budget
    ]
    got = [(p.res_log2, p.kind, p.start_img, p.end_img, p.batch_size)
           for p in phases]
    assert got == expected
    # Phases tile the timeline with no gaps.
    for a, b in zip(phases, phases[1:]):
        assert a.end_img == b.start_img


def test_phase_at_and_alpha_trajectory():
    sched = ScheduleConfig(progressive=True, start_res=4, fade_kimg=2.0,
                           stabilize_kimg=3.0, total_kimg=20.0)
    model = ModelConfig(model="progan", resolution=16)
    phases = build_phases(sched, model)

    assert phase_at(phases, 0).kind == "stabilize"
    p = phase_at(phases, 3000)
    assert (p.res_log2, p.kind) == (3, "fade")
    assert alpha_at(p, 3000) == 0.0
    assert alpha_at(p, 4000) == pytest.approx(0.5)
    assert alpha_at(p, 4999) == pytest.approx(0.9995)
    assert alpha_at(phase_at(phases, 5000), 5000) == 1.0   # stabilize
    # Beyond the end: stays in the last phase at alpha 1.
    p_end = phase_at(phases, 10 ** 9)
    assert (p_end.res_log2, p_end.kind) == (4, "stabilize")
    assert alpha_at(p_end, 10 ** 9) == 1.0


def test_alpha_monotone_within_fade():
    sched = ScheduleConfig(progressive=True, start_res=4, fade_kimg=1.0,
                           stabilize_kimg=1.0, total_kimg=10.0)
    model = ModelConfig(model="progan", resolution=8)
    phases = build_phases(sched, model)
    fade = [p for p in phases if p.kind == "fade"][0]
    alphas = [alpha_at(fade, s)
              for s in range(fade.start_img, fade.end_img, 100)]
    assert all(b >= a for a, b in zip(alphas, alphas[1:]))
    assert alphas[0] == 0.0
