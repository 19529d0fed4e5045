"""Pure-Python tfevents writer round-trips through TensorBoard's own reader.

The reference always writes TensorBoard event files (train.py:819-835);
ours must be readable by a stock TensorBoard install with torch absent.
The oracle here is the real `tensorboard` package's event-file loader,
which verifies the TFRecord CRCs and parses the Event protos with the
canonical protobuf implementation — fully independent of our hand-rolled
encoder.
"""

import os

import numpy as np
import pytest


def _read_events(path):
    loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    return list(loader.EventFileLoader(path).Load())


def _scalar_of(value):
    """TB >= 2 migrates simple_value into a scalar tensor proto on load."""
    if value.HasField("tensor"):
        return value.tensor.float_val[0]
    return value.simple_value


def test_scalar_roundtrip(tmp_path):
    from spr_pick_tpu.utils.tfevents import TFEventWriter

    w = TFEventWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("train/loss", 0.75, 20)
    w.add_scalar("eval/psnr", -3.25, 20)
    w.add_scalar("big/step", 123.0, 2**40)  # step beyond int32
    w.close()

    events = _read_events(w.path)
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (v.tag, e.step, _scalar_of(v))
        for e in events
        for v in e.summary.value
    ]
    assert ("train/loss", 10, 1.5) in scalars
    assert ("train/loss", 20, 0.75) in scalars
    assert ("eval/psnr", 20, -3.25) in scalars
    assert ("big/step", 2**40, 123.0) in scalars
    walls = [e.wall_time for e in events]
    assert all(wt > 1e9 for wt in walls)  # real unix timestamps


def test_purge_step_writes_session_start(tmp_path):
    from spr_pick_tpu.utils.tfevents import TFEventWriter

    w = TFEventWriter(str(tmp_path), purge_step=100)
    w.add_scalar("t", 1.0, 100)
    w.close()
    events = _read_events(w.path)
    starts = [e for e in events if e.HasField("session_log")]
    assert len(starts) == 1
    assert starts[0].step == 100
    assert starts[0].session_log.status == 1  # START


def test_scalar_writer_always_tb_readable(tmp_path):
    """ScalarWriter (the trainer's sink) produces both tfevents and JSONL."""
    from spr_pick_tpu.utils.image_io import ScalarWriter

    sw = ScalarWriter(str(tmp_path), purge_step=5)
    sw.add_scalar("loss", np.float32(2.0), 5)
    sw.close()

    tfevents = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(tfevents) == 1
    events = _read_events(os.path.join(tmp_path, tfevents[0]))
    scalars = [(v.tag, _scalar_of(v)) for e in events for v in e.summary.value]
    assert ("loss", 2.0) in scalars
    assert os.path.exists(os.path.join(tmp_path, "scalars.jsonl"))
