"""Logger: CSV meters, resume pruning, column-set changes, disabled mode."""

import csv
import os

from r3m_tpu.utils.logger import AverageMeter, Logger


def _read_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.value() == 2.0


def test_csv_meters_and_dump(tmp_path):
    lg = Logger(str(tmp_path))
    for step in range(3):
        lg.log_metrics({"full_loss": float(step), "tcnloss": 0.5}, step, "train")
        lg.dump(step, ty="train")
    rows = _read_rows(tmp_path / "train.csv")
    assert len(rows) == 3
    assert float(rows[2]["full_loss"]) == 2.0


def test_resume_prunes_stale_rows(tmp_path):
    lg = Logger(str(tmp_path))
    for step in range(5):
        lg.log_metrics({"full_loss": 1.0}, step, "train")
        lg.dump(step, ty="train")
    # resume from step 2: rows at/after 2 are stale and must be pruned
    lg2 = Logger(str(tmp_path))
    lg2.log_metrics({"full_loss": 9.0}, 2, "train")
    lg2.dump(2, ty="train")
    rows = _read_rows(tmp_path / "train.csv")
    steps = [float(r["step"]) for r in rows]
    assert steps == [0.0, 1.0, 2.0]
    assert float(rows[-1]["full_loss"]) == 9.0


def test_resume_with_different_columns(tmp_path):
    """Regression: resuming with a different metric set must not crash."""
    lg = Logger(str(tmp_path))
    lg.log_metrics({"full_loss": 1.0, "rewloss": 0.3}, 0, "train")
    lg.dump(0, ty="train")
    lg2 = Logger(str(tmp_path))  # resumed run without the language loss
    lg2.log_metrics({"full_loss": 2.0}, 1, "train")
    lg2.dump(1, ty="train")
    rows = _read_rows(tmp_path / "train.csv")
    assert len(rows) == 2


def test_disabled_logger_writes_nothing(tmp_path):
    lg = Logger(str(tmp_path), enabled=False)
    lg.log_metrics({"full_loss": 1.0}, 0, "train")
    lg.dump(0)
    assert not os.path.exists(tmp_path / "train.csv")


def test_log_and_dump_ctx(tmp_path):
    """Reference LogAndDumpCtx (logger.py:170-183): collect then dump on exit."""
    lg = Logger(str(tmp_path))
    with lg.log_and_dump_ctx(7, "eval") as log:
        log("full_loss", 1.5)
        log("tcnloss", 0.25)
    rows = _read_rows(tmp_path / "eval.csv")
    assert len(rows) == 1
    assert float(rows[0]["step"]) == 7.0
    assert float(rows[0]["full_loss"]) == 1.5
    assert float(rows[0]["tcnloss"]) == 0.25


def test_tensorboard_sink_writes_events(tmp_path):
    """use_tb=True must produce an events file (the reference's TB path was
    dead code — SummaryWriter never imported, logger.py:133)."""
    import glob

    import pytest

    pytest.importorskip("torch.utils.tensorboard")
    lg = Logger(str(tmp_path), use_tb=True)
    # backend is importable, so a None sink means the wiring itself broke
    assert lg._tb is not None
    lg.log_metrics({"full_loss": 1.0}, 0, "train")
    lg._tb.close()  # flush AND release the event-writer thread/file handle
    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
