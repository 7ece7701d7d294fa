"""Training: optimizer schedule, sharded train/eval steps, trainer loop."""

from spatialaudiogen_tpu.train.state import TrainState, create_train_state
from spatialaudiogen_tpu.train.steps import make_train_step, make_eval_step
from spatialaudiogen_tpu.train.lr import staircase_decay
