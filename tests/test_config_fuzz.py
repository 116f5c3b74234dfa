"""Parser robustness: malformed configs must raise clean ValueErrors (the
CLI error boundary turns those into one-line messages), never crash with
unrelated exceptions or hang.

The reference gets this from serde's typed deserialization; here the
hand-rolled INI/JSON5 front-ends are fuzzed with systematic mutations of
real corpus files.
"""

import os
import random

import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

from yolodl_tpu.config import darknet_cfg as dk

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg")

ACCEPTABLE = (ValueError, KeyError)


def _mutations(text, rng, n):
    lines = text.splitlines()
    for _ in range(n):
        kind = rng.randrange(5)
        mutated = list(lines)
        i = rng.randrange(len(mutated))
        if kind == 0:      # drop a line
            del mutated[i]
        elif kind == 1:    # corrupt a value
            if "=" in mutated[i]:
                key = mutated[i].split("=")[0]
                mutated[i] = f"{key}=banana"
        elif kind == 2:    # duplicate a section header somewhere
            mutated.insert(i, "[convolutional]")
        elif kind == 3:    # truncate the file
            mutated = mutated[:i + 1]
        else:              # inject garbage
            mutated.insert(i, "@@@ ???")
        yield "\n".join(mutated)


def test_darknet_parser_fuzz(tmp_path):
    text = open(CFG).read()
    rng = random.Random(0)
    survived = parsed = 0
    for k, mutated in enumerate(_mutations(text, rng, 80)):
        p = tmp_path / f"m{k}.cfg"
        p.write_text(mutated)
        try:
            darknet = dk.Darknet.load(str(p))
            # building the graph may legitimately reject inconsistent nets
            from yolodl_tpu.graph.from_darknet import graph_from_darknet

            graph_from_darknet(darknet)
            parsed += 1
        except ACCEPTABLE:
            survived += 1
        # anything else (TypeError, AttributeError, ZeroDivisionError,
        # IndexError, RecursionError...) propagates and fails the test
    # distribution sanity: the mutation set must exercise BOTH outcomes —
    # some mutations parse (e.g. dropped optional lines), some raise
    assert survived > 10 and parsed > 10, (survived, parsed)


def test_json5_model_fuzz(tmp_path):
    import json

    from yolodl_tpu.graph.ir import Graph

    base = {
        "main_group": "m",
        "groups": {
            "m": [
                {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
                {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
                {"name": "det", "kind": "Detect2D", "classes": 1,
                 "anchors": [[0.4, 0.4]]},
                {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
            ]
        },
    }
    rng = random.Random(1)
    checked = 0
    for k in range(40):
        cfg = json.loads(json.dumps(base))
        nodes = cfg["groups"]["m"]
        kind = rng.randrange(4)
        if kind == 0:
            del nodes[rng.randrange(len(nodes))]
        elif kind == 1:
            nodes[rng.randrange(len(nodes))]["kind"] = "Banana"
        elif kind == 2:
            nodes[1]["c"] = rng.choice([-1, 0, "x"])
        else:
            cfg["main_group"] = "missing"
        p = tmp_path / f"j{k}.json5"
        p.write_text(json.dumps(cfg))
        try:
            Graph.load_newslab_v1_json(str(p))
        except ACCEPTABLE:
            pass
        checked += 1
    assert checked == 40


def test_app_config_fuzz(tmp_path):
    """Mutations of the reference's own train.json5 through
    TrainAppConfig.load: clean ValueError/KeyError/TypeError-at-coercion,
    never an unrelated crash or a silent mis-parse of a corrupt file."""
    import json

    import json5

    from yolodl_tpu.config.app_config import TrainAppConfig

    base = json5.load(open(os.path.join(REPO, "cfg/train.json5")))
    rng = random.Random(3)

    def paths(d, pfx=()):
        for k, v in d.items():
            yield pfx + (k,)
            if isinstance(v, dict):
                yield from paths(v, pfx + (k,))

    all_paths = list(paths(base))
    survived = parsed = 0
    for k in range(60):
        cfg = json.loads(json.dumps(base))
        target = rng.choice(all_paths)
        node = cfg
        for key in target[:-1]:
            node = node[key]
        kind = rng.randrange(3)
        if kind == 0:
            del node[target[-1]]
        elif kind == 1:
            node[target[-1]] = rng.choice(["banana", -3, None, [1, 2]])
        else:
            node[target[-1]] = {"type": "Banana"}
        p = tmp_path / f"t{k}.json5"
        p.write_text(json.dumps(cfg))
        try:
            TrainAppConfig.load(str(p))
            parsed += 1
        except (ValueError, KeyError, TypeError):
            survived += 1
        # anything else (AttributeError, IndexError, RecursionError...)
        # propagates and fails the test
    assert survived > 10 and parsed > 10, (survived, parsed)


def test_detect_config_fuzz(tmp_path):
    """Same mutation battery over the reference's detect.json5."""
    import json

    import json5

    from yolodl_tpu.config.app_config import DetectAppConfig

    base = json5.load(open(os.path.join(REPO, "cfg/detect.json5")))
    rng = random.Random(5)

    def paths(d, pfx=()):
        for k, v in d.items():
            yield pfx + (k,)
            if isinstance(v, dict):
                yield from paths(v, pfx + (k,))

    all_paths = list(paths(base))
    survived = parsed = 0
    for k in range(60):
        cfg = json.loads(json.dumps(base))
        target = rng.choice(all_paths)
        node = cfg
        for key in target[:-1]:
            node = node[key]
        kind = rng.randrange(3)
        if kind == 0:
            del node[target[-1]]
        elif kind == 1:
            node[target[-1]] = rng.choice(["banana", -3, None, [1, 2]])
        else:
            node[target[-1]] = {"type": "Banana"}
        p = tmp_path / f"d{k}.json5"
        p.write_text(json.dumps(cfg))
        try:
            DetectAppConfig.load(str(p))
            parsed += 1
        except (ValueError, KeyError, TypeError):
            survived += 1
    assert survived > 10 and parsed > 10, (survived, parsed)


@pytest.mark.parametrize("snippet", [
    "[net]\nwidth=0\nheight=32\nchannels=3\n[convolutional]\nfilters=8\n",
    "[net]\nwidth=32\nheight=32\nchannels=3\n[route]\nlayers=-99\n",
    "[net]\nwidth=32\nheight=32\nchannels=3\n[shortcut]\nfrom=-99\n",
])
def test_known_bad_configs_raise_cleanly(tmp_path, snippet):
    p = tmp_path / "bad.cfg"
    p.write_text(snippet)
    from yolodl_tpu.graph.from_darknet import graph_from_darknet

    with pytest.raises(ACCEPTABLE):
        graph_from_darknet(dk.Darknet.load(str(p)))
