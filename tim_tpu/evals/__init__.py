from tim_tpu.evals.metrics import topk_accuracy, multitask_accuracy
from tim_tpu.evals.meters import WindowVoteAccumulator
from tim_tpu.evals import nms
