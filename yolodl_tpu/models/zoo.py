"""Convenience constructors: one call from config file to runnable model."""

from __future__ import annotations

from typing import Dict, Tuple

import jax

from ..config import darknet_cfg as dk
from ..graph import Graph
from ..graph.from_darknet import graph_from_darknet
from .builder import YoloModel
from .weights import load_darknet_weights, merge_into_model_tree


def load_newslab_model(path, seed: int = 0) -> Tuple[YoloModel, Dict, Dict]:
    """NEWSLABv1 JSON5 → (model, params, state) with fresh init."""
    model = YoloModel(Graph.load_newslab_v1_json(path))
    params, state = model.init(jax.random.PRNGKey(seed))
    return model, params, state


def _load_darknet(wrapper, cfg_path, weights_path, seed):
    """Shared cfg → (model, params, state) path; ``wrapper`` picks the
    model class (YoloModel for detectors, GraphModel for classifiers)."""
    darknet = dk.Darknet.load(cfg_path)
    model = wrapper(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(seed))
    if weights_path is not None:
        loaded_p, loaded_s, _seen = load_darknet_weights(darknet, weights_path)
        params, state = merge_into_model_tree(loaded_p, loaded_s, params, state)
    return model, params, state


def load_darknet_classifier(cfg_path, weights_path=None, seed: int = 0):
    """darknet classification cfg (no [yolo] heads) → (GraphModel, params, state)."""
    from .builder import GraphModel

    return _load_darknet(GraphModel, cfg_path, weights_path, seed)


def load_darknet_model(
    cfg_path, weights_path=None, seed: int = 0
) -> Tuple[YoloModel, Dict, Dict]:
    """darknet .cfg (+ optional .weights) → (model, params, state)."""
    return _load_darknet(YoloModel, cfg_path, weights_path, seed)
