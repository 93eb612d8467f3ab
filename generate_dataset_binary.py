#!/usr/bin/env python
"""Generate a binary dataset pickle from raw .terms/.taxo/.embed files
(the reference's generate_dataset_binary.py:4-15).

    python generate_dataset_binary.py --taxon_name computer_science \
        --data_dir ./data/MAG_CS [--embed_suffix word2vec] [--existing_partition]
"""
import argparse

from taxoexpan_tpu.data.taxonomy import Taxonomy

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Generate binary dataset")
    parser.add_argument("-t", "--taxon_name", required=True, type=str,
                        help="taxonomy name (file prefix)")
    parser.add_argument("-d", "--data_dir", required=True, type=str,
                        help="directory containing .terms/.taxo/.embed files")
    parser.add_argument("-es", "--embed_suffix", default="", type=str,
                        help="embed file suffix")
    parser.add_argument("-p", "--existing_partition", action="store_true",
                        help="use existing .terms.{train,validation,test}")
    args = parser.parse_args()
    taxo = Taxonomy.from_raw_dir(args.taxon_name, args.data_dir,
                                 embed_suffix=args.embed_suffix,
                                 existing_partition=args.existing_partition)
    print(f"Saved pickled dataset: {taxo.num_nodes} nodes, "
          f"{taxo.num_edges} edges, "
          f"{len(taxo.train_node_ids)}/{len(taxo.validation_node_ids)}/"
          f"{len(taxo.test_node_ids)} train/val/test")
