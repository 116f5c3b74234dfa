"""Shared plumbing for the inference-side CLIs (detect / eval).

One definition of "config → live model + parameters" so the two entry
points cannot drift (they had already diverged once: detect grew a
missing-cfg guard on the NMS options that eval lacked).
"""

from __future__ import annotations

import os


def build_model(config, base_dir: str, weights: str = "",
                checkpoint: str = "", ema: bool = False, seed: int = 0):
    """DetectAppConfig → (model, params, state, model_path).

    ``weights`` loads a darknet ``.weights`` file (darknet cfgs only);
    ``checkpoint`` overlays a framework ``.ckpt``; ``ema`` selects the
    checkpoint's EMA parameters and is rejected without a checkpoint —
    silently evaluating raw weights as "the EMA model" would be worse
    than an error.
    """
    import jax

    from ..graph import Graph
    from ..graph.from_darknet import load_darknet_graph
    from ..models import YoloModel
    from ..train.checkpoint import load_checkpoint

    model_path = os.path.join(base_dir, config.model_file)
    if config.model_kind == "darknet":
        if weights:
            from ..models.zoo import load_darknet_model

            model, params, state = load_darknet_model(model_path, weights)
        else:
            model = YoloModel(load_darknet_graph(model_path))
            params, state = model.init(jax.random.PRNGKey(seed))
    else:
        model = YoloModel(Graph.load_newslab_v1_json(model_path))
        params, state = model.init(jax.random.PRNGKey(seed))
    if checkpoint:
        params, state, _, meta = load_checkpoint(checkpoint, params, state)
        if ema:
            if "ema" not in meta:
                raise SystemExit("checkpoint has no EMA parameters")
            params = meta["ema"]
    elif ema:
        raise SystemExit(
            "--ema needs --checkpoint: EMA parameters live in framework "
            "checkpoints, not in .weights files")
    return model, params, state, model_path


def nms_options(config, model_path: str):
    """(nms_kind, beta) honoring the darknet cfg's nms_kind/beta_nms
    (yolo.rs NmsKind; parser.c:490 beta default) — greedy defaults when
    the cfg is absent (e.g. artifact-only runs)."""
    nms_kind, nms_beta = "greedy", 0.6
    if config.model_kind == "darknet" and os.path.exists(model_path):
        from ..config import darknet_cfg as dk
        from ..loss.nms import nms_options_from_darknet

        nms_kind, nms_beta = nms_options_from_darknet(
            dk.Darknet.load(model_path))
    return nms_kind, nms_beta
