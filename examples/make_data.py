"""Generate the demo inputs used by the example scripts."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import datagen  # noqa: E402


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(2026)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=5, seq_len=30_000, return_sequences=True
    )
    with open(os.path.join(out_dir, "pan.paf"), "w") as fh:
        fh.write(text)
    datagen.write_fasta(os.path.join(out_dir, "pan.fa"), seq_data)
    # Simulated reads from two haplotypes (a diploid ref+s1 sample).
    with open(os.path.join(out_dir, "reads.fastq"), "w") as fh:
        for i in range(600):
            src = seq_data["ref"] if i % 2 else seq_data["s1"]
            s = rng.randint(0, len(src) - 400)
            frag = src[s : s + 400]
            fh.write(f"@r{i}\n{frag}\n+\n{'I' * len(frag)}\n")
    with open(os.path.join(out_dir, "regions.bed"), "w") as fh:
        fh.write("ref\t2000\t8000\tlocus1\nref\t15000\t22000\tlocus2\n")
    print(f"demo inputs -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/impg_demo")
