import argparse

from . import serve

parser = argparse.ArgumentParser(description="comfy3d_tpu preview server")
parser.add_argument("--host", default="127.0.0.1")
parser.add_argument("--port", type=int, default=8189)
parser.add_argument("--root", action="append", default=None,
                    help="allowed file roots (repeatable)")
args = parser.parse_args()
serve(host=args.host, port=args.port,
      allowed_roots=args.root or ["/"])
