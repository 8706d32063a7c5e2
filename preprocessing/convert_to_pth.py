"""npy -> pth tensor conversion (reference: ``preprocessing/convert_to_pth.py``)."""
import argparse

import numpy as np
import torch

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--npy", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    a = p.parse_args()
    torch.save(torch.from_numpy(np.load(a.npy)), a.out)
    print("wrote", a.out)
