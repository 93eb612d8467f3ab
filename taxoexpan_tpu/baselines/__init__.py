"""Standalone baselines (capability parity with reference `baselines/`):

- simple_parent: rank candidates by query<->candidate cosine distance
- simple_structure: parent distance + aggregated sibling distance
- simple_mlp: MLP / DeepSetMLP / DeepAPGMLP edge scorers (JAX)
- xgb_features: NegativeQueue + 39 hand-crafted distance features
  (+ gradient-boosting trainer gated on xgboost availability)
"""
