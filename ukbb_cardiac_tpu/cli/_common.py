"""Shared CLI plumbing: tf.app.flags-style boolean parsing."""

from __future__ import annotations

import argparse


def add_bool_flag(parser: argparse.ArgumentParser, name: str, default: bool,
                  help_: str = "") -> None:
    """A --name / --noname boolean pair (tf.app.flags compatibility)."""
    group = parser.add_mutually_exclusive_group()
    group.add_argument(f"--{name}", dest=name, action="store_true", help=help_)
    group.add_argument(f"--no{name}", dest=name, action="store_false")
    parser.set_defaults(**{name: default})
