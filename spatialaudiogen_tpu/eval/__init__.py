"""Evaluation: on-device metric battery + host-side mel-LSD/envelope/EMD,
eval-detailed.txt emission and result aggregation."""

from spatialaudiogen_tpu.eval.host_metrics import (
    melspectrogram,
    compute_mel_lsd,
    compute_envelope_dist,
)
from spatialaudiogen_tpu.eval.evaluator import Evaluator
