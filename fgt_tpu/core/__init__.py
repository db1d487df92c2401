"""Shared numeric core: flow I/O, visualization, region fill, masks, metrics.

This replaces the byte-identical copies that the reference keeps in both
FGT/ and LAFC/ (see SURVEY.md intro) with one shared library.
"""

from fgt_tpu.core.flow_io import read_flow, write_flow
from fgt_tpu.core.flow_viz import flow_to_rgb, flow_to_image
from fgt_tpu.core.region_fill import regionfill
from fgt_tpu.core.masks import create_random_shape_with_random_motion
from fgt_tpu.core import metrics
