import sys
sys.path.insert(0, "/root/repo/profiling")
from knn_pallas2 import *
chain("s5 probes+compact   ", s5_probes)
chain("s5 +gather (P2=40)  ", s5_gather)
chain("v5 full compacted   ", v5)
chain("v4 full             ", v4)
