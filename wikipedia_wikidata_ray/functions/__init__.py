"""wikipedia_wikidata_ray.functions"""
