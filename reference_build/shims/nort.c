/* LD_PRELOAD stub: pretend sched_setscheduler succeeded without actually
 * switching to SCHED_FIFO.  In this container the cgroup has no RT
 * runtime allocated, so a thread that wins SCHED_FIFO (we run as root)
 * becomes runnable-but-never-scheduled and radiod's FFT worker starves
 * forever.  Keeping everything SCHED_OTHER restores normal scheduling.
 */
#define _GNU_SOURCE 1
#include <sched.h>
#include <sys/types.h>

int sched_setscheduler(pid_t pid, int policy, const struct sched_param *param) {
  (void)pid;
  (void)policy;
  (void)param;
  return 0;
}
