"""Training orchestration: the reference's ``*Learner`` layer, TPU-native.

The reference holds G, D, G-EMA and optimizers in a mutable Learner object
and mutates module structure on progressive growth (SURVEY.md 3.3). Here:

* ``TrainState`` is one immutable pytree (params for G/D/EMA, optimizer
  states, w-average, PRNG key, step/shown-image counters).
* ``schedule`` computes the progressive phase plan as a pure function of
  shown images — the state machine is data, not control flow.
* ``steps.build_train_step`` builds ONE jitted function per (resolution,
  phase-kind): D update + penalty + G update + EMA + w-avg + counters, with
  fade-in alpha computed inside jit from the shown-image counter (traced —
  a whole fade phase is one compiled program).
* ``loop`` is the host-side driver: picks the compiled step for the current
  phase, feeds uint8 batches, and handles logging/samples/checkpoints.
"""

from ganlab_tpu.train.schedule import PhaseSpec, build_phases, phase_at
from ganlab_tpu.train.state import TrainState, create_train_state
from ganlab_tpu.train.steps import build_train_step, build_sample_fn
