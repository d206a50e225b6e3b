"""Aggregate memory-bandwidth control: N processes each repeatedly
copying a 256 MB numpy buffer; reports aggregate GB/s copied.
If aggregate bandwidth saturates between 8 and 32 procs, the box's
memory system — not cores — is the binding resource."""
import multiprocessing as mp, numpy as np, time, sys, json

def worker(q, secs):
    a = np.random.bytes(256 * 1024 * 1024)
    src = np.frombuffer(a, dtype=np.uint8)
    dst = np.empty_like(src)
    n = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        np.copyto(dst, src); n += 1
    q.put(n * src.nbytes * 2 / (time.time() - t0))  # read+write bytes

def run(procs, secs=4.0):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, secs)) for _ in range(procs)]
    [p.start() for p in ps]
    tot = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return tot / 1e9

if __name__ == "__main__":
    out = {}
    for n in (1, 8, 32):
        out[str(n)] = round(run(n), 1)
    out["eff_8_to_32"] = round((out["32"] / out["8"]) / 4, 3)
    print(json.dumps(out))
