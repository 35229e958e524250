from tim_tpu.convert.torch_import import (
    recognition_params_from_torch, detection_params_from_torch)
