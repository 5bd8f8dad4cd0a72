"""wikipedia_wikidata_ray.ops"""
