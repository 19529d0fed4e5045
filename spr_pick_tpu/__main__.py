"""`python -m spr_pick_tpu` entry point (parity: spr_pick/__main__.py)."""

from spr_pick_tpu.cli.cli import start

if __name__ == "__main__":
    start()
