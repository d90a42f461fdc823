"""Channel bit-packing: float RGB rows -> packed pixel bytes.

Vectorized NumPy port of ``process_pixel`` (/root/reference/src/render.cpp:
396-466): per channel, ``clamp(f_r*r + f_g*g + f_b*b + f_c, 0, 1)`` is scaled
to ``bit_size`` bits (``lround``, i.e. half away from zero) or bit-cast when
``tfloat``, then channels are packed MSB-first into ``bytes_per_pixel``
bytes; ``reversed`` flips the byte order.

This is a host-side post-process (the device returns float RGB); the packing
cost is trivial next to the trace.  The C layout uses two 64-bit words per
pixel (MAX_PIXELSIZE = 16 bytes), reproduced here with a (N, 2) uint64
accumulator.
"""

from __future__ import annotations

import numpy as np

from ..render import ImageFormat


def pack_rows(colors: np.ndarray, fmt: ImageFormat) -> np.ndarray:
    """colors: (rows, W, 3) float32 -> (rows, W*bytes_per_pixel) uint8."""
    rows, w, _ = colors.shape
    n = rows * w
    c = np.asarray(colors, dtype=np.float32).reshape(n, 3)
    bpp = fmt.bytes_per_pixel

    temp = np.zeros((n, 2), dtype=np.uint64)
    b_offset = 0
    for ch in fmt.channels:
        val = np.clip(ch.f_r * c[:, 0] + ch.f_g * c[:, 1] + ch.f_b * c[:, 2]
                      + np.float32(ch.f_c), 0.0, 1.0).astype(np.float32)
        if ch.tfloat:
            ival = val.view(np.uint32).astype(np.uint64)
        else:
            scale = np.float64(0xFFFFFFFF >> (32 - ch.bit_size))
            # std::lround: round half away from zero (values here are >= 0)
            ival = np.floor(val.astype(np.float64) * scale + 0.5).astype(np.uint64)

        o = b_offset // 64
        rm = b_offset % 64
        s = 64 - rm - ch.bit_size
        if s >= 0:
            temp[:, o] |= ival << np.uint64(s)
        else:
            temp[:, o] |= ival >> np.uint64(-s)
        if rm + ch.bit_size > 64:
            temp[:, o + 1] = ival << np.uint64(128 - rm - ch.bit_size)
        b_offset += ch.bit_size

    # big-endian byte extraction (render.cpp:449-461)
    out = np.empty((n, bpp), dtype=np.uint8)
    byte_order = range(bpp - 1, -1, -1) if fmt.reversed else range(bpp)
    for out_j, j in enumerate(byte_order):
        word = temp[:, j // 8]
        shift = np.uint64((8 - 1 - (j % 8)) * 8)
        out[:, out_j] = (word >> shift).astype(np.uint8)

    return out.reshape(rows, w * bpp)
