// EINTR-proof native block for the watchdog regression tests
// (tests/test_watchdog_native.py, tests/test_bench_emission.py).
//
// Models the failure mode that cost rounds 2 and 4 their benchmark artifact:
// a thread stuck inside a native PJRT transfer call on a dead tunnel hour.
// CPython only runs Python-level signal handlers between bytecodes, so a
// SIGALRM delivered while the thread is in here interrupts the nanosleep
// (EINTR) but the Python handler cannot run until this function returns —
// which it refuses to do early, exactly like a blocking transfer that
// restarts its syscall. The only reliable bound is a watchdog *thread* that
// emits the best-known result and _exits the process (bench._arm_watchdog).
#include <time.h>

extern "C" void ostpu_native_block(double seconds) {
    struct timespec req, rem;
    req.tv_sec = (time_t)seconds;
    req.tv_nsec = (long)((seconds - (double)req.tv_sec) * 1e9);
    while (nanosleep(&req, &rem) != 0) {
        req = rem;  // EINTR: re-sleep the remainder, never return early
    }
}
