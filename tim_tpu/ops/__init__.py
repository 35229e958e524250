from tim_tpu.ops.attention import tim_attention, dense_masked_attention, tim_attention_mask
from tim_tpu.ops.intervals import pairwise_iou_1d, segment_iou_1d
from tim_tpu.ops import losses
from tim_tpu.ops import quant
