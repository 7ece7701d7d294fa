"""Deployment: sliding-window full-video inference, 360 mux, SA3D metadata."""

from spatialaudiogen_tpu.deploy.deploy import MonoToAmbix
