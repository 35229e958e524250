from tim_tpu.runner.recognition import RecognitionRunner
from tim_tpu.runner.detection import DetectionRunner
