"""Flax model library: layer wrappers, ResNet18, and the SptAudioGen model."""

from spatialaudiogen_tpu.models.sptaudiogen import SptAudioGen, SptAudioGenConfig
from spatialaudiogen_tpu.models.resnet import ResNet18
