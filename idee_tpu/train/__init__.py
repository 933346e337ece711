"""Training subsystem: jitted train/eval steps, schedules, checkpointing,
metrics, and the mesh-parallel wiring."""

from idee_tpu.train.schedule import make_epoch_schedule  # noqa: F401
from idee_tpu.train.state import TrainState, create_train_state  # noqa: F401
from idee_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
