from openea_tpu.data.kg import KG, KGs, read_kgs_from_folder, read_reversed_kgs_from_folder, read_kgs_from_files
from openea_tpu.data import read
from openea_tpu.data.synthetic import synthesize_kg_pair, write_kg_pair_folder
