"""Evaluation: FID (a judged deliverable new to this framework, SURVEY.md 5).

The reference has no built-in FID; BASELINE.json's metric requires one. The
evaluator is feature-extractor-pluggable:

* ``InceptionExtractor`` — a JAX port of the pytorch-fid InceptionV3
  (pool3, 2048-d); weights load from a torch ``state_dict`` file (this
  container has no network egress, so pretrained weights must be provided
  via ``GANLAB_INCEPTION_WEIGHTS`` or config).
* ``RandomConvExtractor`` — a deterministic random-feature CNN used by the
  test-suite and as a relative-trend metric when no weights are available.
"""

from ganlab_tpu.eval.fid import (
    compute_statistics,
    frechet_distance,
    compute_fid,
    compute_kid,
    compute_precision_recall,
    RandomConvExtractor,
    get_extractor,
)
from ganlab_tpu.eval.inception import InceptionExtractor
from ganlab_tpu.eval.lpips import LPIPSDistance
from ganlab_tpu.eval.ppl import compute_ppl, evaluate_checkpoint_ppl
