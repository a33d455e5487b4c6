"""Model-family registry: one switchable surface over the four frameworks.

The reference ships HAC / HAC++ / TC-GS / CAT-3DGS as sibling forks
(SURVEY.md §1); here they share one scaffold and differ only in context
model + codec, so a family is a small descriptor bundling its config
constructor, state init, training-loss fn, phase schedule, and codec.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class Family:
    name: str
    make_config: Callable[..., Any]
    init_state: Callable
    training_loss: Callable
    phase_of_step: Callable[[int], int]
    conduct_encoding: Callable
    conduct_decoding: Callable
    extra_init: Callable | None = None  # e.g. CAT's PCA frame fit
    grad_mask: Callable | None = None  # per-phase parameter freezes (CAT)


def get_family(name: str) -> Family:
    if name == "hac":
        from gauspcc_tpu.models.hac import codec, model, render
        from gauspcc_tpu.models.hac import train as t

        return Family(
            "hac", model.HACConfig, model.init_state, render.training_loss,
            t.phase_of_step, codec.conduct_encoding, codec.conduct_decoding,
        )
    if name == "hac_plus":
        from gauspcc_tpu.models.hac_plus import codec, model, render
        from gauspcc_tpu.models.hac import train as t

        return Family(
            "hac_plus", model.HACPlusConfig, model.init_state,
            render.training_loss, t.phase_of_step,
            codec.conduct_encoding, codec.conduct_decoding,
        )
    if name == "tcgs":
        from gauspcc_tpu.models.tcgs import codec, model, render

        return Family(
            "tcgs", model.TCGSConfig, model.init_state, render.training_loss,
            render.phase_of_step, codec.conduct_encoding,
            codec.conduct_decoding,
        )
    if name == "cat3dgs":
        from gauspcc_tpu.models.cat3dgs import codec, model, render

        return Family(
            "cat3dgs", model.CATConfig, model.init_state,
            render.training_loss, render.phase_of_step,
            codec.conduct_encoding, codec.conduct_decoding,
            extra_init=model.set_pca_frame,
            grad_mask=render.grad_mask,
        )
    raise ValueError(f"unknown model family: {name!r} "
                     "(choose hac, hac_plus, tcgs, cat3dgs)")


FAMILIES = ("hac", "hac_plus", "tcgs", "cat3dgs")
