"""Retry/backoff parity with the reference's doFetch loop
(scrapemate.go:398-464) and getMaxRetries clamp."""

from crawlspark import constants as C


def test_effective_max_retries_clamp():
    # scrapemate_test.go:654-708 golden cases: 0→1, 1→2, 10→6 attempts
    assert 1 + C.effective_max_retries(0) == 1
    assert 1 + C.effective_max_retries(1) == 2
    assert 1 + C.effective_max_retries(10) == 6
    assert 1 + C.effective_max_retries(5) == 6
    assert 1 + C.effective_max_retries(-3) == 1  # negative → first check exits


def test_backoff_default_cap():
    # 100ms ×2 per retry; cap check AFTER sleep (delay can exceed cap once)
    assert C.backoff_delays_us(5) == [100_000, 200_000, 400_000, 800_000, 1_600_000]
    # 6th sleep would be 3.2s (1.6s ≤ 2s so it doubled), then clamp to 2s
    assert C.backoff_delays_us(7) == [
        100_000, 200_000, 400_000, 800_000, 1_600_000, 3_200_000, 2_000_000,
    ]


def test_backoff_small_cap_oscillation():
    # cap=300ms: 100, 200, 400(>cap after sleep→clamp), 300, 600, 300 ...
    # exactly the reference recurrence: if delay > cap: delay = cap else *= 2
    assert C.backoff_delays_us(6, 300_000) == [
        100_000, 200_000, 400_000, 300_000, 600_000, 300_000,
    ]
