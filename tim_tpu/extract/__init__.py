from tim_tpu.extract.audio import log_mel_spectrogram, mel_filterbank
from tim_tpu.extract.tables import (
    build_feature_time_table, build_video_info)
from tim_tpu.extract.pipeline import (
    extract_features_for_video, merge_feature_dirs)
