"""spatialaudiogen_tpu — TPU-native framework for self-supervised spatial audio generation.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
pedro-morgado/spatialaudiogen (NIPS'18, "Self-Supervised Generation of Spatial
Audio for 360 Video"): given the mono (W) channel of a 360 video's audio plus
RGB frames (and optionally optical flow), predict the remaining first-order
ambisonics channels (Y, Z, X in ACN/SN3D).

Subpackages
-----------
ambisonics  : spherical-harmonics DSP (formats, encoder/decoder, binauralizers,
              spherical power maps, EMD metric).
dsp         : STFT/ISTFT and window-crop geometry matching the reference model.
models      : Flax modules (audio encoder, ResNet18, U-Net separation, decoder).
ops         : Pallas TPU kernels + XLA fallbacks for hot compute paths.
parallel    : device mesh / sharding / pjit training-step utilities.
data        : host-side input pipeline (chunk readers, prefetch, synthetic db).
train       : training loop, optimizer schedule, checkpointing.
eval        : evaluation metric battery and result aggregation.
deploy      : full-video sliding-window inference and 360-video muxing.
etl         : offline dataset acquisition/preprocessing (ffmpeg based).
utils       : audio/video/position I/O, logging, profiling.
"""

__version__ = "0.1.0"
