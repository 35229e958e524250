from tim_tpu.models.tim import TimRecognition, TimDetection
