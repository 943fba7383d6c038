"""TTI timer wheel + resumable procedures (timers.h / stack_procedure.h)."""

from srslte_emane_tpu.utils import timers


def test_timer_expiry_and_stop():
    th = timers.TimerHandler()
    fired = []
    t1 = th.get_unique_timer().set(5, fired.append).run()
    t2 = th.get_unique_timer().set(3, fired.append).run()
    th.step(2)
    assert fired == [] and t1.is_running and t2.is_running
    t2.stop()
    th.step(4)
    assert fired == [t1.id]  # t2 was stopped before its deadline
    assert t1.is_expired and not t2.is_expired
    # re-run after expiry works (handle reuse, timers.h semantics)
    t1.set(2).run()
    th.step(2)
    assert fired == [t1.id, t1.id]


def test_timer_rearm_supersedes_old_deadline():
    th = timers.TimerHandler()
    fired = []
    t = th.get_unique_timer().set(2, fired.append).run()
    th.step(1)
    t.run()  # restart: the old deadline at now+1 must not fire
    th.step(1)
    assert fired == []
    th.step(1)
    assert fired == [t.id]


def test_procedure_with_timer_and_subprocedure():
    th = timers.TimerHandler()
    log = []

    def sub():
        log.append("sub-start")
        yield  # one tti
        log.append("sub-end")
        return 42

    def main():
        t = th.get_unique_timer().set(3).run()
        log.append("wait-timer")
        yield t
        log.append("timer-done")
        r = yield timers.Procedure(sub())
        del r  # sub result arrives via .result; generator yield returns None
        return "ok"

    pm = timers.ProcManager()
    results = []
    p = pm.launch(main()).then(results.append)
    for _ in range(6):
        th.step()
        pm.step()
    assert p.is_complete and results == ["ok"]
    assert log == ["wait-timer", "timer-done", "sub-start", "sub-end"]
    assert len(pm) == 0
