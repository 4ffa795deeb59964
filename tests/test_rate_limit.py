"""KeyedRateLimiter behavior with an injected clock."""

from stt_tpu.utils.rate_limit import KeyedRateLimiter


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def test_burst_then_refill():
    clock = Clock()
    rl = KeyedRateLimiter(rate=1.0, burst=2.0, time_fn=clock)
    assert rl.allow("k")
    assert rl.allow("k")
    assert not rl.allow("k")  # burst exhausted
    clock.advance(1.0)
    assert rl.allow("k")  # 1 token refilled
    assert not rl.allow("k")


def test_disabled_when_rate_zero():
    rl = KeyedRateLimiter(rate=0.0)
    for _ in range(100):
        assert rl.allow("any")


def test_keys_independent():
    clock = Clock()
    rl = KeyedRateLimiter(rate=1.0, burst=1.0, time_fn=clock)
    assert rl.allow("a")
    assert rl.allow("b")
    assert not rl.allow("a")
    assert not rl.allow("b")


def test_cost_weighted_consumption():
    clock = Clock()
    rl = KeyedRateLimiter(rate=10.0, burst=100.0, time_fn=clock)
    assert rl.allow("k", cost=100.0)
    assert not rl.allow("k", cost=1.0)
    clock.advance(0.5)
    assert rl.allow("k", cost=5.0)


def test_retry_after():
    clock = Clock()
    rl = KeyedRateLimiter(rate=2.0, burst=2.0, time_fn=clock)
    rl.allow("k")
    rl.allow("k")
    assert abs(rl.retry_after("k") - 0.5) < 1e-9
    assert rl.retry_after("unknown") == 0.0


def test_ttl_pruning():
    clock = Clock()
    rl = KeyedRateLimiter(
        rate=1.0, burst=1.0, ttl_sec=10.0, prune_every_calls=2, time_fn=clock
    )
    rl.allow("old")
    clock.advance(11.0)
    rl.allow("new1")
    rl.allow("new2")  # triggers prune
    assert len(rl) == 2  # 'old' pruned


def test_burst_defaults_to_rate():
    clock = Clock()
    rl = KeyedRateLimiter(rate=3.0, burst=0.0, time_fn=clock)
    assert rl.allow("k")
    assert rl.allow("k")
    assert rl.allow("k")
    assert not rl.allow("k")
