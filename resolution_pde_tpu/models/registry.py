"""Model registry: maps the reference's hydra `_target_` dotted paths and
short names to flax modules, so reference configs port directly
(conf/model/*/_target_, e.g. `models.ffno.FFNO1D`).
"""

from __future__ import annotations

from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}


def register(name: str, cls=None):
    """Register a model class under `name` (decorator or direct call)."""

    def wrap(c):
        _REGISTRY[name] = c
        return c

    if cls is not None:
        return wrap(cls)
    return wrap


def unwrap_output(pred):
    """Normalize a model's prediction to an array: ScOT2d (the 'pos'
    model) returns {'output': array} — the reference's calling convention
    (train/training.py:32-35 `model(batch_x, time_val)['output']`); every
    other model returns the array directly."""
    return pred["output"] if isinstance(pred, dict) else pred


def get_model(name: str):
    """Look up by short name or reference `_target_` dotted path."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    # Accept reference-style dotted path: take the class name, match suffix.
    short = name.rsplit(".", 1)[-1]
    if short in _REGISTRY:
        return _REGISTRY[short]
    raise KeyError(
        f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
    )


def _populate():
    from resolution_pde_tpu.models import (fno, ffno, unet, cno, cno_original,
                                           s4, s4_base, mgpt)

    register("FNO1d", fno.FNO1d)
    register("FNO2d", fno.FNO2d)
    register("FFNO1D", ffno.FFNO1D)
    register("FFNO2D", ffno.FFNO2D)
    register("UNet1d", unet.UNet1d)
    register("UNet2d", unet.UNet2d)
    register("CNO1d", cno.CNO1d)
    register("CNO2d", cno.CNO2d)
    # Reference _target_ aliases (conf/model/*/*.yaml).
    register("models.fno.FNO1d", fno.FNO1d)
    register("models.fno.FNO2d", fno.FNO2d)
    register("models.ffno.FFNO1D", ffno.FFNO1D)
    register("models.ffno.FFNO2D", ffno.FFNO2D)
    register("models.unet.UNet1d", unet.UNet1d)
    register("models.unet.UNet2d", unet.UNet2d)
    register("models.CNO1d.CNO1d", cno.CNO1d)
    register("models.CNO2d.CNO2d", cno.CNO2d)
    register("S4Model", s4.S4Model)
    register("S4NDModel", s4.S4NDModel)
    register("S4D", s4.S4D)
    register("S4Block", s4.S4Block)
    register("models.s4_1d.S4Model", s4.S4Model)
    register("models.s4_2d.S4NDModel", s4.S4NDModel)
    register("models.s4d.S4D", s4.S4D)
    register("CNO2dOriginal", cno_original.CNO2dOriginal)
    # reference cno_2d_original.yaml target (the empty CNO/ module)
    register("CNO.CNO2d_original_version.CNOModule.CNO",
             cno_original.CNO2dOriginal)
    register("S4BaseModel", s4_base.S4BaseModel)
    register("S4SeqModel", s4_base.S4SeqModel)
    register("OneToSeqModel", s4_base.OneToSeqModel)
    register("MoEGPTNO", mgpt.MoEGPTNO)
    register("GNOTOperator", mgpt.GNOTOperator)
    register("models.s4_model.S4BaseModel", s4_base.S4BaseModel)
    register("models.s4seq_model.S4SeqModel", s4_base.S4SeqModel)
    register("models.s4seq_model.OneToSeqModel", s4_base.OneToSeqModel)
    register("S4BaseSeqModel", s4_base.S4BaseSeqModel)
    register("S4DualSeqModel", s4_base.S4DualSeqModel)
    register("SeqAdd", s4_base.SeqAdd)
    register("ChainModel", s4_base.ChainModel)
    register("models.s4seq_model.S4BaseSeqModel", s4_base.S4BaseSeqModel)
    register("models.s4seq_model.S4DualSeqModel", s4_base.S4DualSeqModel)
    register("models.s4seq_model.SeqAdd", s4_base.SeqAdd)
    register("models.s4seq_model.ChainModel", s4_base.ChainModel)
    register("models.mgpt.MoEGPTNO", mgpt.MoEGPTNO)
    from resolution_pde_tpu.models import poseidon
    register("SwinOperator2d", poseidon.SwinOperator2d)
    # 'pos' resolves to the full hierarchical ScOT port (conf/model/pos)
    register("ScOT2d", poseidon.ScOT2d)
    register("pos", poseidon.ScOT2d)
    register("scOT.model.ScOT", poseidon.ScOT2d)


_populate()

MODEL_REGISTRY = _REGISTRY
