from tim_tpu.train.optim import make_optimizer, warmup_cosine_schedule
from tim_tpu.train.state import TrainState, create_train_state
