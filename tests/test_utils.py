"""Host utility tests (StableIndexMap semantics match
src/super_hash_map.rs:102-136; notifier expiry)."""

import time

from tinyrenderer_tpu.utils.containers import BasicTimer, StableIndexMap
from tinyrenderer_tpu.utils.notify import Notification, Notifier


def test_stable_index_map_insert_remove_reuse():
    m = StableIndexMap()
    a = m.insert("a")
    b = m.insert("b")
    c = m.insert("c")
    assert (m.get(a), m.get(b), m.get(c)) == ("a", "b", "c")
    assert len(m) == 3
    assert m.remove(b) == "b"
    assert m.get(b) is None and len(m) == 2
    d = m.insert("d")          # reuses b's slot
    assert d == b
    assert m.get(a) == "a" and m.get(c) == "c"  # handles stable
    assert sorted(v for _, v in m.items()) == ["a", "c", "d"]
    assert m.remove(999) is None


def test_basic_timer_monotonic():
    t = BasicTimer()
    time.sleep(0.01)
    d1 = t.get_delta_and_reset_timer()
    d2 = t.get_delta_and_reset_timer()
    assert d1 >= 0.01
    assert 0 <= d2 < d1


def test_notifier_expiry():
    n = Notifier()
    n.push("stays")
    n._items.append(Notification(message="old", created=time.monotonic() - 100))
    msgs = [t.message for t in n.active()]
    assert msgs == ["stays"]
