"""Host-side utilities: audio/video/position I/O, resampling, subprocess,
logging and profiling."""
