"""Signal-processing layer: STFT/ISTFT and model window-crop geometry."""

from spatialaudiogen_tpu.dsp.stft import stft, istft, stft_for_loss, hann_window
from spatialaudiogen_tpu.dsp.geometry import ModelGeometry
