"""TensorboardWriter tag/step contract, asserted against a stub backend.

The image has no TensorBoard backend (torch's SummaryWriter import fails),
so the writer normally no-ops; this test injects a recording stub to pin the
contract the trainer relies on (logger/visualization.py:27-34 parity):
mode-suffixed tags, the current step attached to every scalar, and the
steps_per_sec emission on set_step.
"""
import numpy as np

from taxoexpan_tpu.utils.writer import TensorboardWriter


class _StubBackend:
    def __init__(self):
        self.scalars = []
        self.texts = []
        self.hists = []
        self.closed = False

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, value, step))

    def add_text(self, tag, text, step):
        self.texts.append((tag, text, step))

    def add_histogram(self, tag, values, step):
        self.hists.append((tag, np.asarray(values).shape, step))

    def close(self):
        self.closed = True


def _stubbed_writer(tmp_path):
    w = TensorboardWriter(tmp_path, enabled=False)
    w.writer = _StubBackend()
    return w


def test_tags_carry_mode_and_step(tmp_path):
    w = _stubbed_writer(tmp_path)
    w.set_step(0, "train")
    w.add_scalar("loss", 1.5)
    w.set_step(3, "valid")
    w.add_scalar("macro_mr", 7)
    w.add_text("note", "hi")
    w.add_histogram("params/w", np.zeros((2, 3)))
    w.close()

    b = w.writer
    assert ("loss/train", 1.5, 0) in b.scalars
    assert ("macro_mr/valid", 7.0, 3) in b.scalars
    assert b.texts == [("note/valid", "hi", 3)]
    assert b.hists == [("params/w/valid", (2, 3), 3)]
    assert b.closed


def test_steps_per_sec_emitted_on_nonzero_step(tmp_path):
    w = _stubbed_writer(tmp_path)
    w.set_step(0, "train")   # resets the timer, no emission
    w.set_step(1, "train")
    tags = [t for t, _, _ in w.writer.scalars]
    assert tags == ["steps_per_sec/train"]
    _, value, step = w.writer.scalars[0]
    assert value > 0 and step == 1


def test_disabled_writer_is_noop(tmp_path):
    w = TensorboardWriter(tmp_path, enabled=False)
    assert w.writer is None
    w.set_step(1, "train")   # must not raise without a backend
    w.add_scalar("loss", 1.0)
    w.close()
