"""Host-side input pipeline: dataset readers, feeder, synthetic data."""

from spatialaudiogen_tpu.data.providers import FilenameProvider
from spatialaudiogen_tpu.data.readers import (
    AudioChunkReader,
    VideoFrameReader,
    FlowFrameReader,
    SampleReader,
)
from spatialaudiogen_tpu.data.pipeline import Feeder, load_channel_masks
