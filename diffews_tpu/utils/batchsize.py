"""Inference micro-batch sizing.

Counterpart of `marigold/util/batchsize.py:9-62` (a VRAM-keyed lookup for
ensemble micro-batches).  On TPU the same role is played by an HBM-keyed
table; entries derive from measured bf16/f32 footprints of the fused
episode graph at each resolution (2 UNet streams + VAE activations).
"""

from __future__ import annotations

# {hbm_gib_floor: {resolution_ceiling: {bf16: bs, f32: bs}}}
_BS_TABLE = {
    32: {512: {True: 48, False: 24}, 768: {True: 20, False: 10}},
    16: {512: {True: 16, False: 8}, 768: {True: 6, False: 3}},
    8: {512: {True: 8, False: 4}, 768: {True: 3, False: 1}},
}


def find_batch_size(ensemble_size: int, input_res: int, bf16: bool = True,
                    hbm_gib: float | None = None) -> int:
    """Largest safe episode micro-batch for the device, capped at the work."""
    if hbm_gib is None:
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            hbm_gib = stats.get("bytes_limit", 16 << 30) / (1 << 30)
        except Exception:
            hbm_gib = 16
    for floor in sorted(_BS_TABLE, reverse=True):
        if hbm_gib >= floor:
            table = _BS_TABLE[floor]
            break
    else:
        return 1
    for res_ceiling in sorted(table):
        if input_res <= res_ceiling:
            bs = table[res_ceiling][bf16]
            break
    else:
        bs = 1
    return max(1, min(bs, ensemble_size))
