from tim_tpu.data.windows import (
    build_recognition_windows, build_detection_windows, window_feat_indices,
    timestamp_to_seconds)
from tim_tpu.data.dataset import (
    FeatureStore, RecognitionDataset, DetectionDataset, batch_iterator)
