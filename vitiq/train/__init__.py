from vitiq.train.optim import TrainState, create_train_state, get_learning_rate, set_learning_rate  # noqa: F401
from vitiq.train.schedule import EarlyStopping, ReduceLROnPlateau  # noqa: F401
from vitiq.train.loop import fit, make_eval_step, make_train_step  # noqa: F401
from vitiq.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
