"""Model inspector CLI (``yolo-tool`` equivalent, yolo-tool/src/main.rs:38-77).

    python -m yolodl_tpu.cli.tool_main info path/to/model.{json5,cfg}
    python -m yolodl_tpu.cli.tool_main make-dot-file model.json5 out.dot
"""

from __future__ import annotations

import argparse


def _load_graph(path: str):
    from ..graph import Graph
    from ..graph.from_darknet import load_darknet_graph

    if path.endswith(".cfg"):
        return load_darknet_graph(path)
    return Graph.load_newslab_v1_json(path)


def main(argv=None):
    parser = argparse.ArgumentParser(description="yolodl_tpu model inspector")
    sub = parser.add_subparsers(dest="command", required=True)

    info = sub.add_parser("info", help="print per-node table")
    info.add_argument("model_file")

    dot = sub.add_parser("make-dot-file", help="export Graphviz DOT")
    dot.add_argument("model_file")
    dot.add_argument("output_file")

    args = parser.parse_args(argv)
    graph = _load_graph(args.model_file)

    if args.command == "info":
        print(graph.info_table())
    else:
        with open(args.output_file, "w") as f:
            f.write(graph.to_dot())
        print(f"wrote {args.output_file}")


if __name__ == "__main__":
    main()
