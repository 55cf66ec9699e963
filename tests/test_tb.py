"""TensorBoard event-file writer: crc32c correctness, record framing, scalar
round-trip, and MetricLogger integration (the reference's self.log ->
TensorBoard surface, ModelMeta.py:258-287)."""

import numpy as np

from fdtpu.utils.tb import EventWriter, crc32c, read_scalars


def test_crc32c_vector():
    # RFC 3720 / standard Castagnoli test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_event_roundtrip(tmp_path):
    w = EventWriter(tmp_path)
    w.add_scalars(1, {"loss": 1.5, "recall": 0.25}, prefix="training/")
    w.add_scalars(2, {"loss": 0.75}, prefix="validation/")
    rows = read_scalars(w.path)
    assert rows[0][0] == 1
    np.testing.assert_allclose(rows[0][1]["training/loss"], 1.5)
    np.testing.assert_allclose(rows[0][1]["training/recall"], 0.25)
    assert rows[1] == (2, {"validation/loss": 0.75})


def test_metric_logger_writes_events(tmp_path):
    from fdtpu.utils.logging import MetricLogger

    logger = MetricLogger(tmp_path / "out.log")
    logger.log_epoch(0, "training", {"loss": 3.0})
    logger.log_epoch(0, "validation", {"loss": 2.0, "recall": 0.5})
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_scalars(files[0])
    assert rows[0][1] == {"training/loss": 3.0}
    assert rows[1][1]["validation/recall"] == 0.5
