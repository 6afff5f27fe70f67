import faulthandler, sys, threading
faulthandler.dump_traceback_later(900, exit=True, file=sys.stderr)
exec(open("bench_slam.py").read())
