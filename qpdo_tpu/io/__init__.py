from .qps import QPSData, read_qps, to_problem, write_qps
