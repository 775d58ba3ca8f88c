"""Training engine: state construction, the jitted 5-phase UDA step, the
epoch loop, and checkpointing."""

from pointcloududa_tpu.train.state import NetState, UDATrainState, create_train_state  # noqa: F401
from pointcloududa_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
