from knn_pallas import *
import sys
sys.path.insert(0, "/root/repo/profiling")
chain("s1 probes            ", s_probes)
chain("s2 +gather           ", s_gather)
chain("s3 +unpack           ", s_unpack)
chain("s4 +pallas topk      ", s_topk)
chain("v3 full              ", v3)
