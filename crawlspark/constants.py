"""Enumerations and defaults mirroring the reference's constants.

Parity source: /root/reference/constants.go:7-29 and
/root/reference/scrapemate.go:398-464 (retry loop constants).
"""

# Retry policies (constants.go:12-19)
RETRY_JOB = 0      # retry with exponential backoff
DISCARD_JOB = 1    # give up after the first failed attempt (scrapemate.go:422-427)
REFRESH_IP = 2     # reference leaves unimplemented (scrapemate.go:450) — retries w/o delay
STOP_SCRAPING = 3  # cancel the whole crawl (scrapemate.go:429-435)

# Priorities (constants.go:23-28) — LOWER number = HIGHER priority
PRIORITY_HIGH = 0
PRIORITY_MEDIUM = 1
PRIORITY_LOW = 2

# Unknown priority routes to the high channel (memory.go:78-87 default case)
KNOWN_PRIORITIES = (PRIORITY_HIGH, PRIORITY_MEDIUM, PRIORITY_LOW)

# Retry loop (scrapemate.go:398-464)
MAX_RETRIES_CAP = 5                 # getMaxRetries clamp (scrapemate.go:455-464)
INITIAL_RETRY_DELAY_US = 100_000    # 100ms (scrapemate.go:409-412)
DEFAULT_MAX_RETRY_DELAY_US = 2_000_000  # 2s (constants.go:21, job.go:270-276)

# Job states in the frontier table (new-engine spec, SURVEY.md §1.3)
ST_PENDING = "pending"
ST_DONE = "done"
ST_FAILED = "failed"
ST_DISCARDED = "discarded"
TERMINAL_STATES = (ST_DONE, ST_FAILED, ST_DISCARDED)

# Default UA (constants.go:9) — carried as job header metadata
DEFAULT_USER_AGENT = (
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/91.0.4472.114 Safari/537.36"
)

# Engine defaults (new-engine spec)
DEFAULT_HOST_BUCKETS = 64      # salted host buckets to defuse hot-host skew
DEFAULT_HOST_SALT = 42
DEFAULT_WAVE_BUDGET = 10_000   # max jobs fetched per wave
DEFAULT_HOST_BUDGET = 8        # max jobs per host per wave (politeness default)
DEFAULT_MAX_WAVES = 1_000      # safety guard (reference analog: inactivity exit)


def backoff_delays_us(n_retries: int, max_delay_us: int = DEFAULT_MAX_RETRY_DELAY_US):
    """The exact sleep sequence of the reference's retry loop.

    Parity: /root/reference/scrapemate.go:408-448 — delay starts at 100ms;
    after each sleep, ``if delay > maxRetryDelay: delay = maxRetryDelay
    else: delay *= 2``. Note the clamp happens AFTER the sleep, so one sleep
    may exceed the cap before the clamp kicks in (pinned by unit test).
    """
    delays = []
    delay = INITIAL_RETRY_DELAY_US
    for _ in range(n_retries):
        delays.append(delay)
        if delay > max_delay_us:
            delay = max_delay_us
        else:
            delay *= 2
    return delays


def effective_max_retries(max_retries: int) -> int:
    """Parity: scrapemate.go:455-464 — clamp only when above 5.

    Negative values yield zero retries (retry(0) >= maxRetries(-1) is true
    on the first check), so attempts = 1 + max(0, min(max_retries, 5)).
    """
    return max(0, min(max_retries, MAX_RETRIES_CAP))
