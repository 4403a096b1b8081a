"""Runtime config (core/config + extensions/config analogs)."""

from .property_tree import pnode  # noqa: F401
from .parse import parse, parse_json, registry, type_descriptor  # noqa: F401
