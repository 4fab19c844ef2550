from .idct import idct_s32, dequant_premult
from .motion import motion_compensate, motion_compensate_multi
from .frame import decode_frame_planes, assemble_luma, assemble_chroma
from .color import ycbcr_to_rgb_int, ycbcr_to_rgb_rec601

__all__ = [
    'idct_s32', 'dequant_premult', 'motion_compensate',
    'motion_compensate_multi',
    'decode_frame_planes', 'assemble_luma', 'assemble_chroma',
    'ycbcr_to_rgb_int', 'ycbcr_to_rgb_rec601',
]
