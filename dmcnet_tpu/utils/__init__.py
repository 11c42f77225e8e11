"""Utilities: flow visualization, logging helpers."""

from dmcnet_tpu.utils.viz import make_colorwheel, viz_flow
