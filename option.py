"""Reference-compatible `option` module (reference option.py:1-27).

Importing this module yields a parsed `args` like the reference, but via
`parse_known_args` so embedding contexts (pytest, tools) don't crash on
extra argv. New code should prefer `lft_tpu.config.parse_args()`.
"""

from lft_tpu.config import Args, build_parser

_ns, _ = build_parser().parse_known_args()
args = Args(**vars(_ns))
